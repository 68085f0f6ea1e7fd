from .features import branch_c_features  # noqa: F401
from .sequences import vrae_input_sequences, rnn_input_sequences  # noqa: F401
from .submission import run_submission  # noqa: F401

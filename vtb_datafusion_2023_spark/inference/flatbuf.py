"""Minimal read-only FlatBuffers wire-format accessor (pure stdlib).

The FlatBuffers binary layout is public and stable (google/flatbuffers
`internals` doc): a buffer starts with a uint32 offset to the root table;
a table starts with an int32 *soffset* back to its vtable; the vtable is
``[u16 vtable_bytes, u16 table_bytes, u16 field_off_0, ...]`` where each
field offset is relative to the table start (0 = field absent, use the
schema default); non-scalar fields store a uint32 forward offset to their
target; vectors and strings are ``[u32 length, elements...]``.

This module implements just enough of that spec to *read* a buffer given
schema knowledge (field slot ids), with zero dependencies.  It exists so
the engine can open the reference's CatBoost ``.cbm`` artifact (which is
``"CBM1" + u32 size + flatbuffer``) without the catboost package — see
``inference/cbm.py``.
"""

from __future__ import annotations

import struct


class Table:
    """A positioned view of one flatbuffers table."""

    __slots__ = ("buf", "pos", "_voff")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self._voff = pos - struct.unpack_from("<i", buf, pos)[0]

    def _field_pos(self, slot: int) -> int | None:
        """Absolute buffer position of field `slot`, or None if absent."""
        vt_bytes = struct.unpack_from("<H", self.buf, self._voff)[0]
        entry = 4 + 2 * slot
        if entry + 2 > vt_bytes:
            return None
        off = struct.unpack_from("<H", self.buf, self._voff + entry)[0]
        return self.pos + off if off else None

    # -- scalar accessors (return `default` when the field is absent) --
    def i32(self, slot: int, default: int = 0) -> int:
        p = self._field_pos(slot)
        return default if p is None else struct.unpack_from("<i", self.buf, p)[0]

    def f64(self, slot: int, default: float = 0.0) -> float:
        p = self._field_pos(slot)
        return default if p is None else struct.unpack_from("<d", self.buf, p)[0]

    def bool_(self, slot: int, default: bool = False) -> bool:
        p = self._field_pos(slot)
        return default if p is None else self.buf[p] != 0

    # -- reference accessors --
    def _indirect(self, p: int) -> int:
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def string(self, slot: int) -> str | None:
        p = self._field_pos(slot)
        if p is None:
            return None
        o = self._indirect(p)
        n = struct.unpack_from("<I", self.buf, o)[0]
        return self.buf[o + 4 : o + 4 + n].decode("utf-8")

    def table(self, slot: int) -> "Table | None":
        p = self._field_pos(slot)
        return None if p is None else Table(self.buf, self._indirect(p))

    def _vec(self, slot: int) -> tuple[int, int] | None:
        p = self._field_pos(slot)
        if p is None:
            return None
        o = self._indirect(p)
        return o + 4, struct.unpack_from("<I", self.buf, o)[0]

    def vector_scalar(self, slot: int, fmt: str) -> list:
        """Vector of fixed-size scalars; fmt is a struct code ('i','I','f','d','B','H')."""
        v = self._vec(slot)
        if v is None:
            return []
        start, n = v
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, start)) if n else []

    def vector_bytes(self, slot: int, elem_size: int) -> bytes:
        """Raw bytes of a vector of fixed-size structs (caller decodes)."""
        v = self._vec(slot)
        if v is None:
            return b""
        start, n = v
        return self.buf[start : start + n * elem_size]

    def vector_tables(self, slot: int) -> list["Table"]:
        v = self._vec(slot)
        if v is None:
            return []
        start, n = v
        return [Table(self.buf, self._indirect(start + 4 * i)) for i in range(n)]

    def vector_len(self, slot: int) -> int:
        v = self._vec(slot)
        return 0 if v is None else v[1]


def root_table(buf: bytes) -> Table:
    return Table(buf, struct.unpack_from("<I", buf, 0)[0])

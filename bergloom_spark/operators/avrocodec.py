"""Pure-Python Apache Avro Object Container File (OCF) reader.

Why it exists: Apache Iceberg's manifest lists and manifest files are
Avro OCFs (Iceberg table spec, "Manifests" / "Manifest Lists"), and
this container ships no Avro library — so reading a *real* Iceberg
table's metadata (``lake/iceberg_import.py``, reference parity with
``compaction/mod.rs:226`` ``catalog.load_table``) needs a
self-contained decoder. Implemented from the public Avro 1.11
specification (container file format + binary encoding); generic — it
decodes ANY writer schema embedded in the file, not just Iceberg's.

Scope: reader only (the rebuild never writes Avro — our own lake
metadata is JSON by design), ``null`` and ``deflate`` codecs (the two
the Avro spec requires/defines without external libs; Iceberg writers
default to deflate or null). Decoded values: records → dicts, arrays
→ lists, maps → dicts, bytes/fixed → ``bytes``, enum → symbol string,
union → the decoded branch. Logical types are NOT interpreted (the
caller sees the underlying primitive) except nothing is lost — the
schema is returned alongside the records for callers that care.

Hostile-input posture (same contract as the other byte-level parsers
in this package): ``bytes → (schema, records) | ValueError``; all
counts are bounds-checked against the remaining payload before any
allocation, and inflate runs under an absolute budget.
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"
_MAX_INFLATE = 64 << 20  # absolute per-block inflate budget
# Records that decode to ZERO payload bytes (empty record, bare
# "null") are legal Avro but unbounded-allocation fuel; allow a few,
# never millions (ADVICE r12).
_ZERO_BYTE_RECORD_ALLOWANCE = 4096
# A count (array/map/blocked collection) may not exceed the bytes
# that could possibly encode it (1 byte per item minimum).
_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes",
    "string",
}


class _Reader:
    __slots__ = ("d", "pos", "items")

    def __init__(self, d: bytes, pos: int = 0):
        self.d = d
        self.pos = pos
        # Decoded-item budget (review r12): schemas whose items decode
        # to ZERO bytes (empty record, "null") defeat every
        # bytes-remaining count check — a 64 KB deflate block claiming
        # 64M empty records would allocate gigabytes "within bounds".
        # Every container construction (record, array item, map entry,
        # top-level record) spends one unit; the budget is
        # bytes-proportional, so real data never notices while a
        # zero-byte bomb dies at ~4x its own payload size.
        self.items = 4 * len(d) + 4096

    def spend_item(self) -> None:
        self.items -= 1
        if self.items < 0:
            raise ValueError(
                "avro: decoded item count exceeds the payload-"
                "proportional budget (zero-byte-item bomb)"
            )

    def remaining(self) -> int:
        return len(self.d) - self.pos

    def read_raw(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.d):
            raise ValueError(
                f"avro: need {n} bytes at {self.pos}, have "
                f"{self.remaining()}"
            )
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        """Zigzag varint (spec: int/long binary encoding)."""
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.d):
                raise ValueError("avro: truncated varint")
            b = self.d[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 63:
                raise ValueError("avro: varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read_raw(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


def _register_named(schema, names: dict) -> None:
    """Pre-pass collecting named types (record/enum/fixed) so later
    string references resolve (the spec guarantees a name is defined
    before — or at — its first use in the schema document)."""
    if isinstance(schema, list):
        for s in schema:
            _register_named(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        name = schema.get("name")
        ns = schema.get("namespace")
        if name:
            full = f"{ns}.{name}" if ns and "." not in name else name
            names[full] = schema
            names[name] = schema  # short-name lookup is common
    if t == "record":
        for f in schema.get("fields", []):
            _register_named(f.get("type"), names)
    elif t == "array":
        _register_named(schema.get("items"), names)
    elif t == "map":
        _register_named(schema.get("values"), names)
    elif isinstance(t, (dict, list)):
        _register_named(t, names)


def _decode(schema, r: _Reader, names: dict):
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.read_raw(1) != b"\x00"
        if schema in ("int", "long"):
            return r.read_long()
        if schema == "float":
            return struct.unpack("<f", r.read_raw(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.read_raw(8))[0]
        if schema == "bytes":
            return r.read_bytes()
        if schema == "string":
            return r.read_string()
        if schema in names:
            return _decode(names[schema], r, names)
        raise ValueError(f"avro: unknown type {schema!r}")
    if isinstance(schema, list):  # union: branch index then value
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro: union branch {idx} out of range")
        return _decode(schema[idx], r, names)
    if not isinstance(schema, dict):
        raise ValueError(f"avro: malformed schema node {schema!r}")
    t = schema["type"]
    if t == "record":
        r.spend_item()
        return {
            f["name"]: _decode(f["type"], r, names)
            for f in schema.get("fields", [])
        }
    if t == "enum":
        symbols = schema.get("symbols", [])
        idx = r.read_long()
        if not 0 <= idx < len(symbols):
            raise ValueError(f"avro: enum index {idx} out of range")
        return symbols[idx]
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()  # block byte size (skippable hint)
            if n > r.remaining() + 1:
                raise ValueError(f"avro: array count {n} exceeds payload")
            for _ in range(n):
                r.spend_item()
                out.append(_decode(schema["items"], r, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            if n > r.remaining() + 1:
                raise ValueError(f"avro: map count {n} exceeds payload")
            for _ in range(n):
                r.spend_item()
                key = r.read_string()
                out[key] = _decode(schema["values"], r, names)
        return out
    if t == "fixed":
        return r.read_raw(int(schema["size"]))
    # type may itself be a nested/union/named definition
    return _decode(t, r, names)


def _read_meta_map(r: _Reader) -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        if n > r.remaining() + 1:
            raise ValueError("avro: metadata count exceeds payload")
        for _ in range(n):
            key = r.read_string()
            out[key] = r.read_bytes()
    return out


def parse_avro(payload: bytes, with_meta: bool = False):
    """OCF ``payload`` → ``(schema: dict|list|str, records: list)``,
    or ``(schema, records, file_metadata: dict[str, bytes])`` with
    ``with_meta=True`` (Iceberg manifests carry required spec keys in
    the OCF file metadata).

    Raises ValueError on any malformed input (never returns partial
    records)."""
    r = _Reader(payload)
    if r.read_raw(4) != _MAGIC:
        raise ValueError("avro: bad magic (not an OCF)")
    meta = _read_meta_map(r)
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema")
    try:
        schema = json.loads(meta["avro.schema"])
    except json.JSONDecodeError as exc:
        raise ValueError(f"avro: unparseable schema: {exc}") from exc
    codec = meta.get("avro.codec", b"null").decode("latin-1")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    sync = r.read_raw(16)
    names: dict = {}
    # The embedded schema is ATTACKER BYTES like everything else: a
    # mutated-but-still-JSON document can drop required keys, swap
    # node types, nest pathologically, or declare absurd sizes. Every
    # structural surprise must surface as the contract's ValueError,
    # never a KeyError/TypeError/RecursionError escaping to the
    # caller (r12 fuzz campaign finding, first 20k-mutation run).
    try:
        _register_named(schema, names)
        records: list = []
        zero_byte_records = 0
        # Global amplification bound: however well the blocks deflate,
        # a file may not decode to more records than a generous
        # multiple of its own (compressed) size — 64 records per
        # payload byte covers any real writer (records are ≥1 byte
        # inflated and deflate tops out near 1032:1 only on
        # pathological constant runs) while capping a 64 KB bomb at
        # ~4M items instead of the inflate cap's 64M.
        record_cap = 64 * len(r.d) + 65536
        while r.remaining() > 0:
            n = r.read_long()
            size = r.read_long()
            if n < 0 or size < 0:
                raise ValueError("avro: negative block header")
            block = r.read_raw(size)
            if codec == "deflate":
                try:
                    dec = zlib.decompressobj(-15)  # raw deflate per spec
                    block = dec.decompress(block, _MAX_INFLATE)
                    if dec.unconsumed_tail:
                        raise ValueError(
                            f"avro: block inflates past {_MAX_INFLATE}"
                        )
                except zlib.error as exc:
                    raise ValueError(
                        f"avro: bad deflate block: {exc}"
                    ) from exc
            if n > len(block) + _ZERO_BYTE_RECORD_ALLOWANCE:
                raise ValueError(f"avro: block claims {n} records in "
                                 f"{len(block)} bytes")
            br = _Reader(block)
            for _ in range(n):
                before = br.pos
                records.append(_decode(schema, br, names))
                # ADVICE r12: the decoded-item budget is proportional
                # to the INFLATED block, so a 64 KB deflate bomb
                # inflating to the 64 MiB cap with a zero-byte record
                # schema allocated ~64M dicts before the trailing-
                # bytes check fired. Charge records against actual
                # cursor progress: a record that consumed 0 payload
                # bytes draws from a small fixed allowance instead.
                if br.pos == before:
                    zero_byte_records += 1
                    if zero_byte_records > _ZERO_BYTE_RECORD_ALLOWANCE:
                        raise ValueError(
                            "avro: too many zero-byte records "
                            "(payload-amplification bomb)"
                        )
                if len(records) > record_cap:
                    raise ValueError(
                        "avro: decoded record count exceeds the "
                        "compressed-payload-proportional cap"
                    )
            if br.remaining():
                raise ValueError(
                    f"avro: {br.remaining()} trailing bytes in block"
                )
            if r.read_raw(16) != sync:
                raise ValueError("avro: sync marker mismatch")
    except (KeyError, TypeError, IndexError, AttributeError,
            OverflowError, RecursionError, UnicodeDecodeError,
            struct.error) as exc:
        raise ValueError(
            f"avro: malformed schema or payload: {exc!r}"
        ) from exc
    if with_meta:
        return schema, records, meta
    return schema, records

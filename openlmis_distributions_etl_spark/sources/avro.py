"""Avro source/sink WITHOUT the spark-avro DataSource jar
(SURVEY.md §2.B — the container ships Avro core jars but not the
`avro` DataSource module, and there is no network to fetch it).

This is a spec-derived reader for the Apache Avro OBJECT CONTAINER
FILE format (magic `Obj\\x01`, metadata map carrying the writer
schema JSON + codec, sync-marker-framed record blocks; values in
Avro binary encoding — zigzag varints, length-prefixed utf8/bytes,
IEEE little-endian floats), decoded in PYTHON over the `binaryFile`
source: one Arrow-batched `mapInPandas` lane per file, the same
declared-escape-hatch shape as the multimodal decoders. The decode
is per-file data-parallel — a directory of N avro part-files scans
as N independent tasks — but each record passes through Python, so
this is explicitly the NO-JAR FALLBACK: with spark-avro on the
classpath the reader collapses to
`spark.read.format("avro").load(path)` (one line, noted here so the
swap is obvious), and everything downstream is unchanged.

Scope (the tabular-source contract, like the CSV/JSON readers):
top-level record schemas over null / boolean / int / long / float /
double / bytes / string and two-branch null-unions of those; codecs
`null` and `deflate`. Anything else raises loudly at decode with the
unsupported type named — never a silent skip.

The writer exists for round-trips and interchange tests: it encodes
partitions to container files with a deterministic sync marker
(md5 of schema + partition id) via foreachPartition, writing through
the local/DFS-mounted filesystem API.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .files import read_binary_files

_MAGIC = b"Obj\x01"

_AVRO_OF_SPARK = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "string": "string",
    "binary": "bytes",
}
_SPARK_OF_AVRO = {v: k for k, v in _AVRO_OF_SPARK.items()}


# ---------- binary decoding (Avro spec, public) ----------

class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b, self.i = b, 0

    def read(self, n: int) -> bytes:
        out = self.b[self.i:self.i + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.i += n
        return out

    def at_end(self) -> bool:
        return self.i >= len(self.b)

    def long(self) -> int:
        shift, acc = 0, 0
        while True:
            byte = self.b[self.i]
            self.i += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)        # zigzag

    def value(self, typ):
        if isinstance(typ, dict):              # logicalType carrier
            typ = typ["type"]
        if isinstance(typ, list):              # union
            return self.value(typ[self.long()])
        if typ == "null":
            return None
        if typ == "boolean":
            return self.read(1) != b"\x00"
        if typ in ("int", "long"):
            return self.long()
        if typ == "float":
            return struct.unpack("<f", self.read(4))[0]
        if typ == "double":
            return struct.unpack("<d", self.read(8))[0]
        if typ == "bytes":
            return bytes(self.read(self.long()))
        if typ == "string":
            return self.read(self.long()).decode("utf-8")
        raise NotImplementedError(
            f"avro type not supported by the no-jar reader: {typ!r}")


def _decode_container(raw: bytes) -> tuple[list[str], list[list]]:
    """One container file -> (writer field names, rows)."""
    r = _Reader(raw)
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file "
                         "(bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:                   # negative count: block size follows
            n = -n
            r.long()
        for _ in range(n):
            key = r.read(r.long()).decode("utf-8")
            meta[key] = bytes(r.read(r.long()))
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if schema.get("type") != "record":
        raise NotImplementedError(
            "no-jar reader expects a top-level record schema")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec not supported: {codec}")
    fields = schema["fields"]
    names = [f["name"] for f in fields]
    rows: list[list] = []
    while not r.at_end():
        n_rec = r.long()
        blob = bytes(r.read(r.long()))
        if codec == "deflate":
            blob = zlib.decompress(blob, -15)   # raw DEFLATE
        br = _Reader(blob)
        for _ in range(n_rec):
            rows.append([br.value(f["type"]) for f in fields])
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch "
                             "(corrupt block framing)")
    return names, rows


def read_avro(spark: SparkSession, path: str, schema: StructType,
              glob: str | None = "*.avro") -> DataFrame:
    """Explicit-schema Avro reader over binaryFile + mapInPandas.
    Declared columns must exist in each file's writer schema (a
    missing column raises naming it); extra writer columns are
    pruned. With spark-avro on the classpath this whole function is
    `spark.read.format("avro").schema(schema).load(path)`."""
    import pandas as pd

    want = [f.name for f in schema.fields]

    def decode(batches):
        for pdf in batches:
            for raw in pdf["content"]:
                names, rows = _decode_container(bytes(raw))
                missing = [c for c in want if c not in names]
                if missing:
                    raise ValueError(
                        f"declared column(s) {missing} not in avro "
                        f"writer schema {names}")
                idx = [names.index(c) for c in want]
                yield pd.DataFrame(
                    {c: [row[j] for row in rows]
                     for c, j in zip(want, idx)},
                    dtype=object)

    binary = read_binary_files(spark, path, glob).select("content")
    return binary.mapInPandas(decode, schema=schema)


# ---------- encoding (writer for round-trips) ----------

def _zigzag(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1 | 1)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _encode_value(out: io.BytesIO, typ, v) -> None:
    if isinstance(typ, list):                   # ["null", T]
        if v is None:
            _zigzag(out, typ.index("null"))
            return
        branch = 1 - typ.index("null")
        _zigzag(out, branch)
        typ = typ[branch]
    if typ == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif typ in ("int", "long"):
        _zigzag(out, int(v))
    elif typ == "float":
        out.write(struct.pack("<f", float(v)))
    elif typ == "double":
        out.write(struct.pack("<d", float(v)))
    elif typ == "bytes":
        _zigzag(out, len(v))
        out.write(bytes(v))
    elif typ == "string":
        enc = v.encode("utf-8")
        _zigzag(out, len(enc))
        out.write(enc)
    else:
        raise NotImplementedError(
            f"avro type not supported by the writer: {typ!r}")


def _avro_schema_of(schema: StructType, name: str) -> dict:
    fields = []
    for f in schema.fields:
        tn = f.dataType.typeName()
        if tn not in _AVRO_OF_SPARK:
            raise NotImplementedError(
                f"column {f.name}: spark type {tn} has no avro "
                "mapping in the no-jar writer")
        t = _AVRO_OF_SPARK[tn]
        fields.append({"name": f.name,
                       "type": ["null", t] if f.nullable else t})
    return {"type": "record", "name": name, "fields": fields}


def write_avro_files(df: DataFrame, out_dir: str,
                     codec: str = "null") -> dict:
    """Encode each partition as one `part-{pid:05d}.avro` container
    file under out_dir (local/DFS-mounted path). Deterministic sync
    marker = md5(schema JSON + pid). Returns the avro schema dict."""
    import hashlib
    import os

    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec not supported: {codec}")
    avsc = _avro_schema_of(df.schema, "spark_row")
    schema_json = json.dumps(avsc)
    types = [f["type"] for f in avsc["fields"]]
    names = [f["name"] for f in avsc["fields"]]
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(pid: int, rows) -> None:
        body = io.BytesIO()
        n = 0
        for row in rows:
            for nm, t in zip(names, types):
                _encode_value(body, t, row[nm])
            n += 1
        if n == 0:
            return
        payload = body.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        sync = hashlib.md5(
            (schema_json + str(pid)).encode()).digest()
        out = io.BytesIO()
        out.write(_MAGIC)
        _zigzag(out, 2)
        for k, v in (("avro.schema", schema_json.encode()),
                     ("avro.codec", codec.encode())):
            ke = k.encode()
            _zigzag(out, len(ke))
            out.write(ke)
            _zigzag(out, len(v))
            out.write(v)
        _zigzag(out, 0)
        out.write(sync)
        _zigzag(out, n)
        _zigzag(out, len(payload))
        out.write(payload)
        out.write(sync)
        with open(os.path.join(out_dir, f"part-{pid:05d}.avro"),
                  "wb") as fh:
            fh.write(out.getvalue())

    df.rdd.mapPartitionsWithIndex(
        lambda pid, it: (write_partition(pid, it), iter(()))[1],
        preservesPartitioning=True).count()
    return avsc

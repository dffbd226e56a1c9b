"""Avro payload decoding for the Kafka source.

The reference attaches an Avro JSON schema to its Kafka source
(/root/reference/feathr-rs/src/source.rs:49-54 ``KafkaSchema.avroJson``,
source builder source.rs:563-650) and lets the Spark runtime decode the
``value`` column. Here the preferred path is the JVM ``from_avro``
expression (spark-avro on the classpath: codegen'd, zero Python); when
the connector is absent, :func:`decode_avro_payload` falls back to an
Arrow-batched ``mapInPandas`` decoder implementing the Avro binary
encoding for the flat-record-of-primitives subset that Kafka feature
payloads use. Anything deeper (arrays, maps, nested records, non-null
unions) raises with a pointer to the connector — the fallback is a
capability bridge, not a full Avro implementation.

Binary encoding per the Avro 1.11 spec: int/long are zigzag varints,
float/double little-endian IEEE, boolean one byte, string/bytes a long
length followed by the payload, ``["null", T]`` unions a varint branch
index; record fields are concatenated in schema order.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def parse_flat_record_schema(avro_json: str) -> List[Tuple[str, str, bool]]:
    """Parse an Avro record schema into ``[(field, primitive, nullable)]``.

    Only flat records of primitives (optionally ``["null", prim]``) are
    supported — the shape Kafka feature payloads use. Raises
    ``NotImplementedError`` for anything that needs the spark-avro
    connector."""
    schema = json.loads(avro_json) if isinstance(avro_json, str) else avro_json
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise NotImplementedError(
            f"only record schemas are supported, got {schema!r:.80}")
    out = []
    for f in schema.get("fields", []):
        name, ftype = f["name"], f["type"]
        nullable = False
        if isinstance(ftype, list):
            branches = [b for b in ftype if b != "null"]
            if len(branches) != 1 or len(ftype) != 2 or "null" not in ftype:
                raise NotImplementedError(
                    f"field {name!r}: only ['null', primitive] unions are "
                    "supported without the spark-avro connector")
            ftype, nullable = branches[0], True
        if not isinstance(ftype, str) or ftype not in _PRIMITIVES:
            raise NotImplementedError(
                f"field {name!r}: type {ftype!r} needs the spark-avro "
                "connector (flat primitives only in the fallback decoder)")
        out.append((name, ftype, nullable))
    return out


def spark_schema_for(fields: List[Tuple[str, str, bool]]) -> T.StructType:
    return T.StructType([
        T.StructField(n, _PRIMITIVES[t], nullable=nullable or t != "boolean")
        for n, t, nullable in fields])


# -- binary codec -----------------------------------------------------------

def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> Tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _encode_value(val, ftype: str) -> bytes:
    if ftype == "boolean":
        return b"\x01" if val else b"\x00"
    if ftype in ("int", "long"):
        return _zigzag_encode(int(val))
    if ftype == "float":
        return struct.pack("<f", float(val))
    if ftype == "double":
        return struct.pack("<d", float(val))
    if ftype == "string":
        raw = val.encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if ftype == "bytes":
        return _zigzag_encode(len(val)) + bytes(val)
    raise NotImplementedError(ftype)


def _decode_value(buf: bytes, pos: int, ftype: str):
    if ftype == "boolean":
        return buf[pos] == 1, pos + 1
    if ftype in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if ftype == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if ftype == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    raise NotImplementedError(ftype)


def encode_record(row: dict, fields: List[Tuple[str, str, bool]]) -> bytes:
    """Avro-binary-encode one record (test/producer helper)."""
    out = bytearray()
    for name, ftype, nullable in fields:
        val = row.get(name)
        if nullable:
            if val is None:
                out += _zigzag_encode(0)     # union branch 0 = null
                continue
            out += _zigzag_encode(1)         # union branch 1 = value
        elif val is None:
            raise ValueError(f"field {name!r} is not nullable")
        out += _encode_value(val, ftype)
    return bytes(out)


def decode_record(buf: bytes, fields: List[Tuple[str, str, bool]]) -> dict:
    pos, out = 0, {}
    for name, ftype, nullable in fields:
        if nullable:
            branch, pos = _zigzag_decode(buf, pos)
            if branch == 0:
                out[name] = None
                continue
        out[name], pos = _decode_value(buf, pos, ftype)
    return out


# -- Spark integration ------------------------------------------------------

def decode_avro_payload(df: DataFrame, avro_json: str,
                        value_col: str = "value",
                        keep_cols: Tuple[str, ...] = ()) -> DataFrame:
    """Decode ``value_col`` (binary Avro) into top-level columns.

    Prefers the JVM ``from_avro`` expression (whole-stage codegen, no
    Python); transparently falls back to the Arrow-batched pure-Python
    decoder when the spark-avro connector is not on the classpath. Works
    on both batch and streaming DataFrames."""
    try:
        from pyspark.sql.avro.functions import from_avro
        decoded = df.select(
            from_avro(F.col(value_col), avro_json).alias("payload"),
            *[F.col(c) for c in keep_cols])
        decoded.schema  # force analysis: raises if connector absent
        return decoded.select("payload.*", *keep_cols)
    except Exception:  # ImportError or AnalysisException AVRO_NOT_LOADED
        pass
    fields = parse_flat_record_schema(avro_json)
    payload_schema = spark_schema_for(fields)
    out_schema = T.StructType(
        list(payload_schema) + [df.schema[c] for c in keep_cols])
    src = df.select(F.col(value_col), *[F.col(c) for c in keep_cols])

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            recs = [decode_record(v, fields) for v in pdf[value_col]]
            out = pd.DataFrame.from_records(recs, columns=[
                n for n, _, _ in fields])
            for c in keep_cols:
                out[c] = pdf[c].values
            yield out

    return src.mapInPandas(decode_batches, schema=out_schema)

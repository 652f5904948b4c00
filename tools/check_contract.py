"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, comparing row count, column names,
and an order-insensitive canonical value hash.  Usage:

    python3 tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DEFAULT = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 9)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return repr(r)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


_SPARK_T = {
    "bigint": "i64", "long": "i64", "int": "i32", "integer": "i32",
    "smallint": "i32", "double": "f", "float": "f", "string": "s",
    "varchar": "s", "timestamp": "ts", "timestamp_ntz": "ts",
    "boolean": "b", "date": "d",
}
_DUCK_T = {
    # HUGEINT deliberately maps to its own tag: the driver's value hash is
    # type-sensitive, so an uncast sum() (HUGEINT) must FAIL locally even
    # though the values stringify identically (round-1 lesson: q12/ev0/ev3).
    "BIGINT": "i64", "HUGEINT": "i128", "INTEGER": "i32", "SMALLINT": "i32",
    "DOUBLE": "f", "FLOAT": "f", "VARCHAR": "s", "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts", "BOOLEAN": "b", "DATE": "d", "NUMBER": "f",
}


def type_warnings(
    scols: list[str], stypes: list[str], dcols: list[str], dtypes: list[str]
) -> list[str]:
    """Canonicalized dtype diffs (int width / float-vs-decimal) — the
    class of mismatch an order-insensitive value hash can still trip
    on via formatting."""
    smap = {c: _SPARK_T.get(t.lower(), t.lower()) for c, t in zip(scols, stypes)}
    dmap = {c: _DUCK_T.get(t.upper(), t.lower()) for c, t in zip(dcols, dtypes)}
    return [
        f"{c}: spark={smap[c]} duckdb={dmap[c]}"
        for c in smap
        if c in dmap and smap[c] != dmap[c]
    ]


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode("utf-8")).hexdigest()
    return h, lines


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else SF_DEFAULT
    only = set(sys.argv[2:])

    from ocr_document_recognition_service_spark.plans import queries as Q
    from ocr_document_recognition_service_spark.session import build_session

    spark = build_session(app_name="check-contract", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = Q.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in Q.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            stypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(srows)} rows (no oracle) "
                f"[{time.time()-t0:.1f}s]"
            )
            n_rowsonly += 1
            continue
        try:
            desc = con.execute(
                f"DESCRIBE ({oracles[name]})"
            ).fetchall()
            dcols = [r[0] for r in desc]
            dtypes = [r[1] for r in desc]
            drows = con.execute(oracles[name]).fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        dtype_diffs = type_warnings(scols, stypes, dcols, dtypes)
        if dtype_diffs:
            # dtype drift is a hard failure: the driver's external hash is
            # type-sensitive, so local green must imply driver green.
            ok = False
            msgs.append("dtype " + "; ".join(dtype_diffs))
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rows {len(srows)} vs {len(drows)}")
        if ok:
            sh, sl = frame_hash(scols, srows)
            dh, dl = frame_hash(dcols, drows)
            if sh != dh:
                ok = False
                diff = [
                    (a, b) for a, b in zip(sl, dl) if a != b
                ][:3]
                msgs.append(f"value hash; first diffs: {diff}")
        if ok:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

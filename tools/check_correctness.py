#!/usr/bin/env python
"""Local replica of the driver's duckdb-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its DuckDB oracle on the
same parquet tables, compares row count, column names, and values
(column-name-sorted, row-sorted, floats EXACT) and prints a per-query
verdict. Use while iterating:

    python tools/check_correctness.py --sf-dir /root/testdata/sf0.01 [-q name]

Float comparison is exact by default (r8): the r7 driver red on
``corpus_source_report`` was a last-decimal divergence that the old
6dp-rounding compare could never catch — the driver's value-hash is
exact, so this gate must be too. A query whose floats differ at exact
precision but agree to 9 significant digits is reported ``WEAK`` (likely
fp-summation-order noise — it may still hash green at the driver, but it
is one dataset away from a red; prefer integer-exact output columns).
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class ContainerCellError(Exception):
    """A result cell holds a list/tuple/dict. The DRIVER's pandas
    canonicalizer crashes on container cells (`unhashable type: 'list'`,
    r4 `approx_sketches`, r12 `sketch_kmv_distinct`), so this gate must
    FAIL them too — tuple-izing here is exactly how five consecutive
    193-green local sweeps masked a driver red. Serialize arrays to a
    scalar (concat_ws / array_to_string) on BOTH engines instead."""


def normalize(rows: list[tuple],
              sig_digits: int | None = None) -> list[tuple]:
    """Canonicalize rows for comparison. ``sig_digits=None`` keeps floats
    EXACT (the driver's hash is exact); ``sig_digits=9`` collapses
    fp-summation-order noise for the WEAK fallback pass. Container cells
    raise ``ContainerCellError`` — the driver cannot hash them."""
    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if sig_digits is not None and v != 0.0:
                return float(f"{v:.{sig_digits}g}")
            return v
        if hasattr(v, "isoformat"):
            return v.isoformat()[:26]
        if isinstance(v, (list, tuple, set, dict)):
            raise ContainerCellError(
                f"container cell {type(v).__name__} in result — the "
                f"driver's pandas canonicalizer cannot hash it; emit a "
                f"scalar (concat_ws/array_to_string) instead")
        try:
            import decimal
            if isinstance(v, decimal.Decimal):
                return norm(float(v))
        except Exception:
            pass
        return v
    return sorted((tuple(norm(v) for v in r) for r in rows), key=repr)


# Columns whose value chain includes round(<float>·10^k) — a last-bit
# double difference between java.lang.Math.log and DuckDB's libm ln can
# flip the rounded integer by 1 when the float lands on a .5·10^-k
# boundary, so ±1 there is float-provenance noise, not a bug. This is an
# EXPLICIT allowlist: div-computed integer columns (dup_rate_e6,
# avg_chars_e4, empty_frac_e6, ...) are exact by construction, and a ±1
# there is a genuine integer bug (floor-vs-round, div-sign) that must
# stay FAIL, so a bare ``*_e<k>`` name pattern would mask real defects.
_ROUND_DERIVED_COLS = {
    "nll_e9", "min_nll_e9", "max_nll_e9", "avg_nll_e9",  # round(ln·1e12)
    "weight_e4",                                         # DSIR log-ratio
    "score_e6",                                          # BM25 idf_e12
}
# NOT listed on purpose: rrf_e9 (pure-integer rank fusion),
# dup_rate_e6/avg_chars_e4/empty_frac_e6 (integer div of counts) — a ±1
# there is a real bug.


def _only_fixed_point_off_by_one(cols: list[str],
                                 sn: list[tuple],
                                 dn: list[tuple]) -> bool:
    """True iff the two normalized row sets differ ONLY by ±1 in integer
    columns on the ``_ROUND_DERIVED_COLS`` allowlist (fixed-point
    encodings of a rounded float). Rows must already agree in count and,
    pairwise after sorting, in every other column — a ±1 flip cannot
    reorder the sort in a way this misses unless the flip itself changes
    sort position, in which case we conservatively FAIL."""
    if len(sn) != len(dn):
        return False
    fp_idx = {i for i, c in enumerate(cols) if c in _ROUND_DERIVED_COLS}
    if not fp_idx:
        return False
    for a, b in zip(sn, dn):
        for i, (x, y) in enumerate(zip(a, b)):
            if x == y:
                continue
            if (i in fp_idx and isinstance(x, int) and isinstance(y, int)
                    and abs(x - y) <= 1):
                continue
            return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--query", action="append", default=None,
                    help="only check these query names")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from dataweb_spark.session import get_spark

    spark = get_spark("correctness", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"'{args.sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.query or list(qs)
    n_pass = n_fail = n_rowsonly = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        # structural scalar-only contract (r12 verdict item 2): the
        # driver reds on any ArrayType/MapType/StructType result column
        bad_types = [f.name for f in sdf.schema.fields
                     if f.dataType.typeName() in ("array", "map",
                                                  "struct")]
        if bad_types:
            print(f"FAIL  {name}: container-typed result columns "
                  f"{bad_types} — the driver cannot hash them; "
                  f"serialize to scalars")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(oracles[name])
            dcols = [d[0] for d in ddf.description]
            drows = ddf.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            # The driver compares pandas frames with a type-sensitive value
            # hash: DuckDB HUGEINT (sum of any integer type) lands as
            # float64 while Spark emits int64, drifting the hash even when
            # values match (r1 tpch_q12). Compare coarse dtype classes.
            try:
                spd = sdf.toPandas()
                dpd = con.execute(oracles[name]).fetchdf()
                for c in sorted(scols):
                    sk = spd[c].dtype.kind.replace("u", "i")
                    dk = dpd[c].dtype.kind.replace("u", "i")
                    # Only numeric int-vs-float drift trips the driver
                    # (dates arrive as object vs datetime64 on queries that
                    # passed r1 — the driver canonicalizes those).
                    if sk != dk and {sk, dk} <= {"i", "f"}:
                        problems.append(
                            f"dtype drift on {c}: spark {spd[c].dtype} "
                            f"vs duckdb {dpd[c].dtype}")
            except Exception as e:  # arrays etc. may not convert
                problems.append(f"pandas conversion failed: {e}")
        weak = None
        if not problems:
            # compare column-name-sorted values, floats EXACT
            sidx = [scols.index(c) for c in sorted(scols)]
            didx = [dcols.index(c) for c in sorted(dcols)]
            srows_s = [tuple(r[i] for i in sidx) for r in srows]
            drows_s = [tuple(r[i] for i in didx) for r in drows]
            try:
                sn = normalize(srows_s)
                dn = normalize(drows_s)
            except ContainerCellError as e:
                print(f"FAIL  {name}: {e}")
                n_fail += 1
                continue
            if sn != dn:
                # fallback 1: 9 significant digits — collapses fp-sum-order
                # noise but NOT the 1e-4-class rounding divergences
                sn9 = normalize(srows_s, sig_digits=9)
                dn9 = normalize(drows_s, sig_digits=9)
                if sn9 == dn9:
                    weak = ("floats differ at exact precision, agree at "
                            "9 sig digits")
                # fallback 2: ±1 on ALLOWLISTED round-derived fixed-point
                # columns (see _ROUND_DERIVED_COLS) — round(<float>·10^k)
                # encodings can flip the last digit when the float lands
                # on a .5·10^-k boundary; the driver's exact hash would
                # go red, so surface it as WEAK here (one unlucky dataset
                # from a red), never hide it as PASS.
                elif _only_fixed_point_off_by_one(sorted(scols), sn, dn):
                    weak = ("round-derived fixed-point columns off by ±1 "
                            "(float .5-boundary rounding, see "
                            "_ROUND_DERIVED_COLS)")
                else:
                    diffs = [(a, b) for a, b in zip(sn9, dn9)
                             if a != b][:3]
                    problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        elif weak:
            print(f"WEAK  {name}: {len(srows)} rows — {weak} "
                  f"[{time.time()-t0:.1f}s]")
            n_weak += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_weak} weak, {n_fail} fail, "
          f"{n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

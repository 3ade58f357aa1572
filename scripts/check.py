#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out

Loads each <out>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sfdir tables,
and compares: column name sets, row counts, dtype kinds, and values
(exact for non-floats; floats must agree to 1e-9 rel — flagged if not
bit-equal).

Order strictness matches the driver: the driver hashes values in
EMITTED row order (columns sorted by name, rows as produced), so a
query whose ORDER BY is not a total order can emit intra-tie
permutations that differ between engines and fail the driver hash even
though the row SETS are identical (the round-14 q159 miss — check.py
used to sort both sides by all columns, which hid exactly that class).
The primary compare here is therefore in emitted order: Spark parquet
part files read in sorted filename order (range-partitioned sort
output concatenates back in order), DuckDB rows as the ORDER BY emits
them. Only on an emitted-order mismatch do we re-compare sorted, to
distinguish ORDER_MISMATCH (driver hash fail, values fine) from a true
VALUE_MISMATCH.

Dtype strictness matches the driver: the driver hashes values
type-sensitively, so a DuckDB HUGEINT (pandas float64/object) against
a Spark BIGINT (int64) is a driver FAIL even when the numbers agree.
check.py therefore flags any dtype-kind mismatch as DTYPE_MISMATCH
instead of silently coercing to float (the round-10 q105 miss).
"""
import duckdb, json, sys, glob, math
import audit_order

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def compare_cols(sdf, ddf, cols):
    """Column-wise compare of two equal-length frames in their current
    row order. Returns (bad_message_or_None, bitexact_bool)."""
    exact = True
    for c in cols:
        a, b = sdf[c].reset_index(drop=True), ddf[c].reset_index(drop=True)
        if a.dtype.kind != b.dtype.kind:
            # The driver's hash is type-sensitive: int64 vs float64
            # (e.g. an uncast HUGEINT window sum) hashes differently
            # even with identical numeric values. Fail loudly.
            return (f"DTYPE_MISMATCH col={c} spark={a.dtype} duck={b.dtype}",
                    False)
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = a.astype(float); bf = b.astype(float)
            if not af.equals(bf):
                exact = False
                diff = (af - bf).abs()
                denom = bf.abs().clip(lower=1.0)
                rel = (diff / denom).max()
                if not (rel < 1e-9 or math.isnan(rel)):
                    return (f"VALUE_MISMATCH col={c} max_rel={rel}", False)
        else:
            if not a.astype(str).equals(b.astype(str)):
                neq = (a.astype(str) != b.astype(str))
                i = neq.idxmax()
                return (f"VALUE_MISMATCH col={c} row={i} "
                        f"spark={a[i]!r} duck={b[i]!r}", False)
    return (None, exact)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        # Sorted filename order: Spark's sorted write range-partitions
        # into part-00000..N, so lexicographic concatenation IS the
        # query's emitted order (what the driver hashes).
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            sdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            ddf = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            results[name] = f"SCHEMA_MISMATCH spark={scols} duck={dcols}"
            continue
        if len(sdf) != len(ddf):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sdf)} duck={len(ddf)}"
            continue
        # No final top-level ORDER BY (audit_order's detection): the
        # emitted order is engine-dependent, so the emitted-order
        # compare would misclassify a correct query as ORDER/VALUE_
        # MISMATCH nondeterministically. Compare sorted and FLAG —
        # the driver hash is nondeterministic for such a query, so
        # it still counts as a failure to fix (add an ORDER BY).
        keys, _why = audit_order.final_order_keys(sql, list(ddf.columns))
        if keys is None and len(sdf) > 1:
            ssorted = sdf[scols].sort_values(scols).reset_index(drop=True)
            dsorted = ddf[dcols].sort_values(dcols).reset_index(drop=True)
            bad0, _ = compare_cols(ssorted, dsorted, scols)
            results[name] = (
                "NO_ORDER_BY (values equal sorted; driver hash "
                "nondeterministic — add a total ORDER BY)"
                if bad0 is None else bad0)
            continue
        # Primary: emitted-order compare — exactly what the driver
        # hashes. rows already aligned; just project columns.
        bad, exact = compare_cols(sdf[scols], ddf[dcols], scols)
        if bad is None:
            results[name] = "OK" if exact else "OK_FLOAT_TOL"
            continue
        # Emitted order differs: re-compare sorted by all columns to
        # classify. Equal-as-sets means a non-total ORDER BY (or a
        # missing one) — values are right but the driver WILL fail.
        ssorted = sdf[scols].sort_values(scols).reset_index(drop=True)
        dsorted = ddf[dcols].sort_values(dcols).reset_index(drop=True)
        bad2, _ = compare_cols(ssorted, dsorted, scols)
        if bad2 is None:
            results[name] = f"ORDER_MISMATCH (rows equal unordered; driver hash would fail) first={bad}"
        else:
            results[name] = bad2
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in results.items():
        print(f"{name:25s} {v}")
    # queries without oracle: rows-only check
    for name in sorted(set(g.split('/')[-1] for g in glob.glob(f"{outdir}/q*")) - set(oracle)):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"{name:25s} {'ROWS_ONLY ok n=' + str(n) if n > 0 else 'ROWS_ONLY EMPTY'}")
    print(f"\n{n_ok}/{len(results)} oracled queries OK")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

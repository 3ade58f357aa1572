#!/usr/bin/env python3
"""Audit every oracle's final ORDER BY for totality (the q159 class).

Usage: python3 scripts/audit_order.py /root/testdata/sf0.01 /tmp/verify_out

The driver hashes rows in EMITTED order, so an ORDER BY whose key set
does not uniquely determine the row admits intra-tie permutations that
can differ between Spark and DuckDB — values right, hash wrong
(round-14 q159). For each query in oracle_sql.json this script runs
the oracle, extracts the FINAL ORDER BY's key columns, and classifies:

  TOTAL_ORDER     every order-key group holds exactly one row
  TIES_IDENTICAL  tie groups exist but all rows in each are identical
                  (harmless: permuting equal rows preserves the hash)
  TIE_UNSTABLE    a tie group holds >1 DISTINCT row — the q159 bug
  NO_ORDER_BY     no final ORDER BY and >1 row (emitted order is
                  partitioning luck; audit by hand)
  UNPARSED_KEYS   an order key is an expression this script can't map
                  to an output column (audit by hand)

Run at more than one SF: a key unique at sf0.01 can collide at sf0.1.
"""
import duckdb, json, sys, re

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

ORDER_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
TRAIL_RE = re.compile(r"\b(ASC|DESC|NULLS\s+FIRST|NULLS\s+LAST)\b",
                      re.IGNORECASE)

def final_order_keys(sql, columns):
    """Extract the key list of the LAST top-level ORDER BY. Returns
    (keys, reason) where keys is None when absent/unparseable.

    "Last occurrence" is the right heuristic here: every oracle in
    this repo ends with its final ORDER BY (subquery ORDER BYs come
    earlier), and a trailing LIMIT is stripped."""
    matches = list(ORDER_RE.finditer(sql))
    if not matches:
        return None, "NO_ORDER_BY"
    tail = sql[matches[-1].end():]
    # Drop a trailing LIMIT and any trailing semicolon/whitespace.
    tail = re.sub(r"\bLIMIT\s+\d+\s*;?\s*$", "", tail,
                  flags=re.IGNORECASE).strip().rstrip(";").strip()
    # The last ORDER BY must be top-level: if an unbalanced ')' follows
    # it, it lived inside a subquery and the outer query has none.
    depth = 0
    for ch in tail:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return None, "NO_ORDER_BY"
    keys = []
    for part in split_top_commas(tail):
        k = TRAIL_RE.sub("", part).strip()
        # CAST(col AS type): the oracles' SELECT lists alias the same
        # cast back to the bare column name, so ordering by the cast
        # is ordering by that output column (casts here are
        # order-preserving: ts nanos -> TIMESTAMP)
        m = re.fullmatch(r"(?is)CAST\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)\s+AS\s+\w+\s*\)", k)
        if m and m.group(1) in columns:
            keys.append(m.group(1))
            continue
        if re.fullmatch(r"\d+", k):
            idx = int(k) - 1
            if idx < 0 or idx >= len(columns):
                return None, "UNPARSED_KEYS"
            keys.append(columns[idx])
        elif re.fullmatch(
                r'(?:[A-Za-z_][A-Za-z_0-9]*\.)?(?:[A-Za-z_][A-Za-z_0-9]*|"[^"]+")',
                k):
            # a qualified key (d.doc_id) orders by the unqualified
            # output column of the same name — strip the alias
            name = k.split(".")[-1].strip('"')
            if name not in columns:
                return None, "UNPARSED_KEYS"
            keys.append(name)
        else:
            return None, "UNPARSED_KEYS"
    return keys, None

def split_top_commas(s):
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur)); cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    counts = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            df = con.sql(sql).df()
        except Exception as e:
            verdict = f"ORACLE_ERROR: {e}"
            print(f"{name:28s} {verdict}")
            counts["ORACLE_ERROR"] = counts.get("ORACLE_ERROR", 0) + 1
            continue
        keys, reason = final_order_keys(sql, list(df.columns))
        if keys is None:
            verdict = reason if (reason != "NO_ORDER_BY" or len(df) > 1) \
                else "TOTAL_ORDER (<=1 row)"
        elif len(df) == 0:
            verdict = "TOTAL_ORDER (empty)"
        else:
            # Rows as string tuples so arrays/structs group cleanly.
            rows = df.astype(str)
            grouped = rows.groupby(keys, dropna=False, sort=False)
            sizes = grouped.size()
            if (sizes <= 1).all():
                verdict = "TOTAL_ORDER"
            else:
                # ORDER BY every output column: the group keys ARE
                # the whole row, so tie groups are identical by
                # definition — pandas' zero-column drop_duplicates
                # keeps all rows and would misreport TIE_UNSTABLE
                if set(keys) >= set(df.columns):
                    distinct = sizes * 0 + 1
                else:
                    distinct = grouped.apply(
                        lambda g: len(g.drop_duplicates()),
                        include_groups=False)
                if (distinct <= 1).all():
                    verdict = f"TIES_IDENTICAL (max group {sizes.max()})"
                else:
                    n_bad = int((distinct > 1).sum())
                    verdict = (f"TIE_UNSTABLE groups={n_bad} "
                               f"max_group={int(sizes.max())} keys={keys}")
        tag = verdict.split(" ")[0].split("(")[0]
        counts[tag] = counts.get(tag, 0) + 1
        print(f"{name:28s} {verdict}")
    print("\nsummary:", json.dumps(counts))
    bad = counts.get("TIE_UNSTABLE", 0) + counts.get("NO_ORDER_BY", 0) \
        + counts.get("ORACLE_ERROR", 0)
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

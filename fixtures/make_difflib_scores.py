#!/usr/bin/env python3
"""Generate fixtures/difflib_scores.parquet — CPython-difflib scores over
the exact fuzzy-match pair universe (j2_fuzzy_probe / j5_fuzzy_batch).

Dev-time generator, NOT part of the Spark library. The point is
independence: the j2/j5 DuckDB oracle joins this table, so the gate's
similarity numbers come from CPython's own difflib (the semantics the
reference uses, main.py:2804-2924), not from the library's JVM
reimplementation — a true differential test, run by the driver every
round.

Inputs:
  fixtures/pair_universe.sql   -- dumped from Scala (DumpPairUniverseSql);
                                  evaluates the (candidate x base) pair
                                  universe with lowercased names over the
                                  sf0.01 tables.
Output:
  fixtures/difflib_scores.parquet with columns
    article       BIGINT   candidate key
    base_article  BIGINT   base key
    sim           DOUBLE   exact SequenceMatcher(None, cand, base).ratio()
                           (autojunk default True, matching the engine's
                           graft_similarity(a=cand, b=base) convention)
    sim_r4        DOUBLE   Spark round(sim, 4) parity: HALF_UP over the
                           shortest-decimal form (Double.toString/repr)

Regenerate only if TESTDATA or graft.queries.Fixture name construction
changes:
  sbt "runMain graft.tools.DumpPairUniverseSql"
  python3 fixtures/make_difflib_scores.py [sf_dir]
"""
import difflib
import os
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
HERE = os.path.dirname(os.path.abspath(__file__))

with open(os.path.join(HERE, "pair_universe.sql")) as f:
    sql = f.read()

con = duckdb.connect()
for t in ("lineitem", "part"):
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )
rows = con.execute(sql).fetchall()  # (article, cand_lc, base_article, base_lc)

n_cands = len({r[0] for r in rows})
n_bases = len({r[2] for r in rows})
assert len(rows) == n_cands * n_bases, (
    f"pair universe not a full cross product: {len(rows)} != {n_cands}x{n_bases}"
)

# Group by base so SequenceMatcher's cached seq2 preprocessing (b2j +
# autojunk) is reused across all candidates of one base name.
by_base = {}
for art, cand_lc, base, base_lc in rows:
    by_base.setdefault((base, base_lc), []).append((art, cand_lc))


def spark_round4(x: float) -> float:
    # Spark's Round on DoubleType: BigDecimal(Double.toString(d))
    # .setScale(4, HALF_UP).toDouble. repr() is the same
    # shortest-decimal form on CPython.
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


out = {"article": [], "base_article": [], "sim": [], "sim_r4": []}
for (base, base_lc), cands in sorted(by_base.items()):
    sm = difflib.SequenceMatcher(None, "", base_lc)  # autojunk=True default
    for art, cand_lc in cands:
        sm.set_seq1(cand_lc)
        r = sm.ratio()
        out["article"].append(art)
        out["base_article"].append(base)
        out["sim"].append(r)
        out["sim_r4"].append(spark_round4(r))

table = pa.table(
    {
        "article": pa.array(out["article"], pa.int64()),
        "base_article": pa.array(out["base_article"], pa.int64()),
        "sim": pa.array(out["sim"], pa.float64()),
        "sim_r4": pa.array(out["sim_r4"], pa.float64()),
    }
).sort_by([("article", "ascending"), ("base_article", "ascending")])
dest = os.path.join(HERE, "difflib_scores.parquet")
pq.write_table(table, dest, compression="zstd")
print(f"wrote {dest}: {table.num_rows} pairs ({n_cands} cands x {n_bases} bases)")

#!/usr/bin/env python3
"""Hostile edge-fixture generator for the documents/embeddings surface.

Writes a tiny corpus whose rows carry every shape a real crawl feed
produces but the driver's sf fixtures never do: NEGATIVE doc_ids (the
%-vs-pmod class), a NULL doc_id, NULL text, the EMPTY string, NULL
lang/source, <3-word documents (shingle-less), a no-whitespace CJK
mix, and tie-heavy near-identical texts (the interval-union tie
class). The companion embeddings table is SEEDLESS-adjacent: it keeps
vec_id % 50 == 1 seeds absent-able by id choice and carries the same
negative/null ids.

Usage:
  python3 scripts/edge_fixture.py /tmp/sfedge
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/sfedge /tmp/edge_out"
  python3 scripts/oracle_check.py /tmp/sfedge /tmp/edge_out
Expected: every query over documents/embeddings passes; queries whose
tables are missing fail gracefully (oracle_check's ROWS_ONLY /
ORACLE_SQL_ERROR on s2 is the fixture lacking lineitem, not a bug).
"""
import sys
import random
import pyarrow as pa
import pyarrow.parquet as pq

FOX = ("the quick brown fox jumps over the lazy dog again and again"
       " variant {} "
       "the quick brown fox jumps over the lazy dog again and again")


def main(out):
    ids = [-220, -110, -20, -10, -1, None, 0, 10, 20, 30, 40, 50, 55,
           60, 63, 70, 90, 100, 110, 120, 5, 7, 9, 11, 13]
    langs = ["en", None, "de", "fr", "zh", "en", "es", "de", "fr", "zh",
             None, "es", "de", "fr", "zh", "en", "es", "de", "fr", "zh",
             "en", "es", "de", "fr", "zh"]
    srcs = ["src1", "src2", None, "src1", "src1", "src0", "src0", "src1",
            "src2", "src0", "src1", "src2", "src1", None, "src0", "src1",
            "src0", "src1", "src2", "src0", "src2", "src1", "src0",
            "src2", "src1"]
    texts = []
    for i, d in enumerate(ids):
        if d in (-10, None, 50):
            texts.append(None)          # null text
        elif d == 55:
            texts.append("")            # empty string
        elif d == 63:
            texts.append("one")         # 1 word — shingle-less
        elif d == 70:
            texts.append("two words")   # 2 words — shingle-less
        elif d == 90:                   # no-whitespace CJK + latin tail
            texts.append("汉字 漢字 文字 the quick brown fox jumps over"
                         " the lazy dog again and again")
        else:
            texts.append(FOX.format(i))
    nch = [len(t) if t is not None else 0 for t in texts]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(srcs, type=pa.string()),
        "n_chars": pa.array(nch, type=pa.int64()),
    }), f"{out}/documents.parquet")

    rnd = random.Random(7)
    vids = [i for i in ids if i is not None] + [1, 51, 101, 151]
    embs = [[round(rnd.uniform(-1, 1), 3) for _ in range(64)]
            for _ in vids]
    # plant one exact near-dup pair across a sign boundary
    embs[vids.index(-10)] = [v + 0.01 for v in embs[vids.index(10)]]
    pq.write_table(pa.table({
        "vec_id": pa.array(vids, type=pa.int64()),
        "embedding": pa.array(embs, type=pa.list_(pa.float32())),
    }), f"{out}/embeddings.parquet")
    print(f"wrote {out}/documents.parquet ({len(ids)} rows), "
          f"{out}/embeddings.parquet ({len(vids)} rows)")


if __name__ == "__main__":
    import os
    os.makedirs(sys.argv[1], exist_ok=True)
    main(sys.argv[1])

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

The events table carries the stream-side hostile shapes: null
user_id (the sessionization group), null ts (the window order key),
TIED (user, ts) pairs, null event_type/value/props, malformed props
JSON, and negative user_ids — the rows a real telemetry feed grows
the week after launch.

Usage:
  python3 scripts/edge_fixture.py /tmp/sfedge
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/sfedge /tmp/edge_out"
  python3 scripts/oracle_check.py /tmp/sfedge /tmp/edge_out
Expected: every query over documents/embeddings/events passes;
queries whose tables are missing fail gracefully (oracle_check's
ROWS_ONLY / ORACLE_SQL_ERROR on s2 is the fixture lacking lineitem,
not a bug).
"""
import sys
import random
import datetime as dt
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
    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return None if minutes is None else t0 + dt.timedelta(minutes=minutes)

    # (event_id, ts_minutes, user_id, event_type, value, props)
    ev = [
        (0, 0, 1, "signup", 10.00, '{"k": 1}'),
        (1, 5, 1, "view", 20.50, '{"k": 2}'),
        (2, 5, 1, "purchase", 30.25, '{"k": 3}'),     # TIED ts with 1
        (3, 200, 1, "view", 5.00, '{"k": 4}'),        # new session
        (4, 0, -5, "signup", 15.00, '{"k": 5}'),      # negative user
        (5, 10, -5, "purchase", 300.00, '{"k": 6}'),
        (6, 3, None, "view", 7.25, '{"k": 7}'),       # null user
        (7, 8, None, "purchase", 450.75, '{"k": 8}'),
        (8, 12, None, "error", 1.00, None),           # null props
        (9, None, 2, "view", 2.00, '{"k": 9}'),       # null ts
        (10, None, 2, "purchase", 99.99, "{bad json"),
        (11, 30, 2, None, 42.00, '{"k": 10}'),        # null type
        (12, 35, 2, "purchase", None, '{"k": 11}'),   # null value
        (13, 40, 2, "refund", -12.50, ""),            # negative value
        (14, 45, 3, "view", 0.00, '{"k": 0}'),
        (15, 50, 3, "purchase", 500.00, '{"k": 12}'),
        (16, 55, 3, "purchase", 500.00, '{"k": 12}'),  # dup payload
        (17, None, None, None, None, None),            # all-null row
        (18, 60, -5, "error", 3.75, '{"k": 13}'),
        (19, 90, 1, "purchase", 320.00, '{"k": 14}'),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([e[0] for e in ev], type=pa.int64()),
        "ts": pa.array([ts(e[1]) for e in ev], type=pa.timestamp("us")),
        "user_id": pa.array([e[2] for e in ev], type=pa.int64()),
        "event_type": pa.array([e[3] for e in ev], type=pa.string()),
        "value": pa.array([e[4] for e in ev], type=pa.float64()),
        "props": pa.array([e[5] for e in ev], type=pa.string()),
    }), f"{out}/events.parquet")
    print(f"wrote {out}/documents.parquet ({len(ids)} rows), "
          f"{out}/embeddings.parquet ({len(vids)} rows), "
          f"{out}/events.parquet ({len(ev)} rows)")


if __name__ == "__main__":
    import os
    os.makedirs(sys.argv[1], exist_ok=True)
    main(sys.argv[1])

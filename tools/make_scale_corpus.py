#!/usr/bin/env python3
"""Build a deterministic ~10x corpus from sf0.1's documents/embeddings
(driver-side tooling, like check.py — duckdb is not a library dependency).

Scaling recipe (PERF.md "scale slopes"):
- documents: 10 copies; copy 0 is the original; copy c suffixes every
  word with 'x{c}'. Intra-copy duplicate/shingle structure is preserved
  exactly (so the dedup family's candidate counts scale with the corpus)
  while cross-copy shingle collisions are impossible (df distribution
  keeps its shape instead of growing hot keys 10x — the realistic
  "bigger corpus" regime; adversarial hot-key growth is what the df-cap
  is for, tested separately in DedupSpec).
- embeddings: 10 copies; copy c flips the sign of a deterministic
  (hash-chosen) subset of dimensions. Norms and intra-copy geometry are
  exact-preserved; cross-copy vectors land in different LSH buckets.
- events: 10 copies; copy c shifts user_id/event_id by the stride and
  ts by c milliseconds. Same timeline, 10x the traffic and 10x the
  distinct users per window — the production scale axis for the
  windowed-agg family (st01-st04) and the distinct-count sketch (x14):
  window COUNT stays constant while per-window state and the
  distinct-cardinality grow with the corpus.

Other tables are symlinked from the source dir unchanged.
"""
import duckdb
import os
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

dstride = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT d.doc_id + c.copy * {dstride} AS doc_id,
         CASE WHEN c.copy = 0 THEN d.text
              ELSE array_to_string(
                     list_transform(string_split(d.text, ' '),
                                    w -> w || 'x' || c.copy), ' ')
         END AS text,
         d.lang, d.source,
         CASE WHEN c.copy = 0 THEN d.n_chars
              ELSE length(array_to_string(
                     list_transform(string_split(d.text, ' '),
                                    w -> w || 'x' || c.copy), ' '))
         END AS n_chars
  FROM '{src}/documents.parquet' d
  CROSS JOIN (SELECT unnest(generate_series(0, {copies - 1})) AS copy) c
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

vstride = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT e.vec_id + c.copy * {vstride} AS vec_id,
         CASE WHEN c.copy = 0 THEN e.embedding
              ELSE CAST(list_transform(generate_series(1, len(e.embedding)),
                     i -> e.embedding[i] *
                          (CASE WHEN hash(c.copy * 1000 + i) % 2 = 0
                                THEN 1 ELSE -1 END)) AS FLOAT[])
         END AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e
  CROSS JOIN (SELECT unnest(generate_series(0, {copies - 1})) AS copy) c
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

estride = con.sql(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
ustride = con.sql(f"SELECT max(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT e.event_id + c.copy * {estride} AS event_id,
         e.ts + c.copy * INTERVAL 1 MILLISECOND AS ts,
         e.user_id + c.copy * {ustride} AS user_id,
         e.event_type, e.value, e.props
  FROM '{src}/events.parquet' e
  CROSS JOIN (SELECT unnest(generate_series(0, {copies - 1})) AS copy) c
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

for f in os.listdir(src):
    if f.endswith(".parquet") and f not in ("documents.parquet", "embeddings.parquet", "events.parquet"):
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f), dst)

for t in ("documents", "embeddings", "events"):
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{out}/{t}.parquet rows={n}")

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

SKEW MODE (4th arg "skew" — VERDICT r12 #3): the uniform replication
above deliberately preserves distribution SHAPE; the 100 TB risks it
cannot see are Zipfian. Skew mode builds the same 10x row counts with
three planted heavy tails (all deterministic):
- hot query term: in copies >= 1, ~11% of words (hash-chosen) become
  'table' — a term IN the n83 query set, so its document frequency
  grows toward the whole corpus and the BM25 probe's semi-filtered
  posting list is corpus-sized for that term (the hot-term regime for
  n83/n91/st19 and every shingle containing it);
- hot near-dup cluster: base doc_id % 499 == 0 keeps its copy-0 text
  across ALL copies (one prepended mutant token per copy) — a
  ~10x-sized true near-dup cluster, i.e. one hot LSH bucket whose
  candidate pairs grow quadratically in the copy count (what the
  df-cap exists for);
- heavy-tailed lengths: base doc_id % 997 == 0 repeats its text 25x,
  base doc 42 repeats 200x — the giant-document axis (per-doc shingle
  and token blowup inside single tasks).
Embeddings get the vector analog: vec_id % 499 == 0 copies collapse to
tiny perturbations of the base vector (one hot IVF cell + a true
embedding near-dup cluster); the rest sign-flip as in uniform mode.

EVENTS SKEW (round 14 — VERDICT r13 #1): the stateful-streaming hot-KEY
axis the document tails cannot exercise. Same N x row count, three
deterministic tails:
- hot user: in copies >= 1, a hash-chosen ~10% of events remap to
  user_id 0 — one user carrying ~9% of ALL traffic (the bot/service
  account). Grows one key's session state (st03), one side of every
  per-user join (st04 pairs quadratically in this key's density, x11),
  and one group's cardinality (x14).
- burst window: an independent hash-chosen ~10% of copy >= 1 events
  collapse their timestamps into ONE mid-timeline hour (spread
  deterministically across its 3600 seconds) — one tumbling/sliding
  window key holding ~9% of the corpus (st01/st02), that day's
  distinct-user set ~= all users (x14), and a dense one-hour session
  per participating user (st03). DELIBERATE: the burst offset hashes
  the BASE event_id only, so every copy >= 1 of a selected base event
  lands on the IDENTICAL timestamp (the uniform branch's per-copy 1 ms
  spread is dropped here) — exact cross-copy ties are the adversarial
  shape second-granularity logging produces in a real burst, they
  exercise the windowed entries' tie-break rules under density, and
  keeping the recipe fixed preserves comparability with the round-13/14
  ladder rows measured on this corpus (ADVICE r14 #4).
- mega-session / attribution hot spot: the intersection (~0.9% of all
  events: the hot user inside the burst hour) chains the hot user's
  burst events into a single session and puts ALL the hot user's
  burst clicks within the attribution window of ALL its burst
  purchases — the per-key quadratic-pair regime st04's all-pairs
  semantics cannot bound (measured in PERF.md; the bounded production
  configuration is st28's last-click as-of form).
"""
import duckdb
import os
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
skew = len(sys.argv) > 4 and sys.argv[4] == "skew"

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

dstride = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
if skew:
    con.sql(f"""
COPY (
  WITH t AS (
    SELECT d.doc_id + c.copy * {dstride} AS doc_id,
           d.doc_id AS base_id, d.lang, d.source,
           CASE
             WHEN d.doc_id % 499 = 0 THEN
               CASE WHEN c.copy = 0 THEN d.text
                    ELSE 'mutzz' || c.copy || ' ' || d.text END
             WHEN c.copy = 0 THEN d.text
             ELSE array_to_string(
                    list_transform(string_split(d.text, ' '),
                      w -> CASE WHEN hash(w) % 9 = 0 THEN 'table'
                                ELSE w || 'x' || c.copy END), ' ')
           END AS text0
    FROM '{src}/documents.parquet' d
    CROSS JOIN (SELECT unnest(generate_series(0, {copies - 1})) AS copy) c
  )
  SELECT doc_id,
         CASE WHEN base_id = 42 THEN trim(repeat(text0 || ' ', 200))
              WHEN base_id % 997 = 0 THEN trim(repeat(text0 || ' ', 25))
              ELSE text0 END AS text,
         lang, source,
         length(CASE WHEN base_id = 42 THEN trim(repeat(text0 || ' ', 200))
                     WHEN base_id % 997 = 0 THEN trim(repeat(text0 || ' ', 25))
                     ELSE text0 END) AS n_chars
  FROM t
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
else:
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
hotvec = ("CASE WHEN e.vec_id % 499 = 0 AND c.copy > 0 THEN "
          "CAST(list_transform(generate_series(1, len(e.embedding)), "
          "i -> e.embedding[i] + (CASE WHEN i = 1 THEN 0.001 * c.copy "
          "ELSE 0 END)) AS FLOAT[]) ELSE ") if skew else ""
hotvec_end = "END" if skew else ""
con.sql(f"""
COPY (
  SELECT e.vec_id + c.copy * {vstride} AS vec_id,
         {hotvec}
         CASE WHEN c.copy = 0 THEN e.embedding
              ELSE CAST(list_transform(generate_series(1, len(e.embedding)),
                     i -> e.embedding[i] *
                          (CASE WHEN hash(c.copy * 1000 + i) % 2 = 0
                                THEN 1 ELSE -1 END)) AS FLOAT[])
         END {hotvec_end} AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e
  CROSS JOIN (SELECT unnest(generate_series(0, {copies - 1})) AS copy) c
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

estride = con.sql(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
ustride = con.sql(f"SELECT max(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
if skew:
    # burst hour: mid-timeline, so windows before and after it survive
    burst = con.sql(
        f"SELECT min(ts) + INTERVAL 15 DAY FROM '{src}/events.parquet'"
    ).fetchone()[0]
    con.sql(f"""
COPY (
  SELECT e.event_id + c.copy * {estride} AS event_id,
         CASE WHEN c.copy > 0 AND hash(e.event_id * 7919 + 13) % 10 = 5
              THEN TIMESTAMP '{burst}'
                   + to_seconds(CAST(hash(e.event_id) % 3600 AS BIGINT))
                   + to_microseconds(CAST(e.event_id % 1000 AS BIGINT))
              ELSE e.ts + c.copy * INTERVAL 1 MILLISECOND END AS ts,
         CASE WHEN c.copy > 0 AND hash(e.event_id * 104729 + 7) % 10 = 0
              THEN 0
              ELSE e.user_id + c.copy * {ustride} END AS user_id,
         e.event_type, e.value, e.props
  FROM '{src}/events.parquet' e
  CROSS JOIN (SELECT unnest(generate_series(0, {copies - 1})) AS copy) c
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
else:
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

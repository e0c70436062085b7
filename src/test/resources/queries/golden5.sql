-- golden execute file 5: the sampled ANN trainer's end-user path —
-- q114-shaped SQL through the splitter + AdtContext + formatter
-- pipeline. Statement 2 derives the corpus-derived training parameters
-- (k, the clamped sample multiple, the integer sample pct — the exact
-- lloyd2/samplePct formulas), statement 3 materializes the
-- hash-threshold training sample through the CLI's md5_60, and
-- statement 4 runs one full trainer round over it: stratified LCG
-- seeds, the min(struct) assignment argmin, cluster/member accounting.
-- ${EMB} is substituted with the embeddings fixture path by the spec.
CREATE EXTERNAL TABLE g5emb STORED AS PARQUET
LOCATION '${EMB}';
WITH p AS (SELECT count(*) AS n, greatest(8, count(*) DIV 40) AS k FROM g5emb)
SELECT n, k,
  least(100, greatest(1,
    (100 * least(256, greatest(16, (2 * (n DIV k)) DIV 5)) * k) DIV n)) AS pct
FROM p;
WITH p AS (
  SELECT least(100, greatest(1,
      (100 * least(256, greatest(16, (2 * (n DIV k)) DIV 5)) * k) DIV n)) AS pct
  FROM (SELECT count(*) AS n, greatest(8, count(*) DIV 40) AS k FROM g5emb))
SELECT count(*) AS n_sample
FROM g5emb, p
WHERE md5_60(CAST(vec_id AS STRING)) % 100 < pct;
WITH q AS (
  SELECT vec_id,
    transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS v
  FROM g5emb),
p AS (
  SELECT k, least(100, greatest(1,
      (100 * least(256, greatest(16, (2 * (n DIV k)) DIV 5)) * k) DIV n)) AS pct
  FROM (SELECT count(*) AS n, greatest(8, count(*) DIV 40) AS k FROM q)),
s AS (
  SELECT vec_id, v FROM q, p
  WHERE md5_60(CAST(vec_id AS STRING)) % 100 < pct),
seeds AS (
  SELECT CAST(min(((CAST(vec_id AS BIGINT) * 1103515245 + 12345) % 2147483647)
      * 2147483648 + vec_id) % 2147483648 AS BIGINT) AS c_id
  FROM s, p
  GROUP BY ((CAST(vec_id AS BIGINT) * 1103515245 + 12345) % 2147483647) % k),
c0 AS (SELECT seeds.c_id, s.v AS cv FROM seeds JOIN s ON s.vec_id = seeds.c_id),
a AS (
  SELECT s.vec_id,
    min(named_struct(
      'd', aggregate(transform(c0.cv, x -> x * x),
             CAST(0 AS BIGINT), (acc, z) -> acc + z)
         - 2 * aggregate(zip_with(s.v, c0.cv, (x, y) -> x * y),
             CAST(0 AS BIGINT), (acc, z) -> acc + z),
      'c', c0.c_id)).c AS c_id
  FROM s CROSS JOIN c0
  GROUP BY s.vec_id)
SELECT count(DISTINCT c_id) AS n_clusters, count(*) AS n_assigned FROM a

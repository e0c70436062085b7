-- golden execute file 7: a table produced and MAINTAINED by graft's own
-- delta writer (append ×2 → partition backfill via replacePartitions →
-- clustered compaction → checkpoint → vacuum) read back through the
-- exact CLI splitter + context + formatter pipeline — after the whole
-- life cycle the table must still aggregate like the original corpus.
-- ${DELTA_MAINT} is substituted by the spec.
CREATE EXTERNAL TABLE g7w STORED AS DELTA
LOCATION '${DELTA_MAINT}';
SELECT count(*) AS n_rows,
  count(DISTINCT o_orderpriority) AS n_parts FROM g7w;
SELECT o_orderstatus, count(*) AS n
FROM g7w GROUP BY o_orderstatus ORDER BY o_orderstatus

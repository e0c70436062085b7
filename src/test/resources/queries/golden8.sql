-- golden execute file 8: SQL DML against a writer-backed delta table
-- through the exact CLI splitter + context + formatter pipeline —
-- DELETE FROM, UPDATE SET, and the canonical MERGE INTO upsert, each a
-- real versioned commit, with follow-up SELECTs reading the refreshed
-- registration. ${DELTA_DML} is substituted by the spec (a fresh
-- writable copy per run — the script MUTATES the table).
CREATE EXTERNAL TABLE g8t STORED AS DELTA
LOCATION '${DELTA_DML}';
DELETE FROM g8t WHERE n_nationkey >= 20;
UPDATE g8t SET n_name = 'RENAMED' WHERE n_nationkey = 0;
MERGE INTO g8t USING (
  SELECT CAST(99 AS INT) AS n_nationkey, 'ADDED' AS n_name,
         CAST(0 AS INT) AS n_regionkey
) s ON g8t.n_nationkey = s.n_nationkey
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *;
SELECT count(*) AS n FROM g8t;
SELECT n_name FROM g8t WHERE n_nationkey IN (0, 99) ORDER BY n_nationkey

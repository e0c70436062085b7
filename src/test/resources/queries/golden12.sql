-- golden execute file 12: retention-driven LOG cleanup through the
-- exact CLI splitter + context + formatter pipeline. The fixture table
-- arrives with several commits and a checkpoint at its head; VACUUM …
-- LOGS removes exactly the commit prefix the checkpoint covers, and
-- the table keeps reading whole — DESCRIBE HISTORY then shows only the
-- surviving post-checkpoint commits. ${DELTA_LOGS} is substituted by
-- the spec (a fresh writable copy per run).
CREATE EXTERNAL TABLE g12t STORED AS DELTA
LOCATION '${DELTA_LOGS}';
SELECT count(*) AS n_before FROM g12t;
VACUUM g12t LOGS RETAIN 0 HOURS;
SELECT count(*) AS n_after FROM g12t;
DESCRIBE HISTORY g12t

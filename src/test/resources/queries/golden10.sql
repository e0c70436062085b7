-- golden execute file 10: the audit-and-undo surface through the exact
-- CLI splitter + context + formatter pipeline — a CHECK constraint is
-- declared, a DELETE mutates the table, DESCRIBE HISTORY shows the
-- commit trail, RESTORE undoes the delete, and the follow-up SELECTs
-- read the restored registration. ${DELTA_AUDIT} is substituted by the
-- spec (a fresh writable copy per run — the script MUTATES the table).
CREATE EXTERNAL TABLE g10t STORED AS DELTA
LOCATION '${DELTA_AUDIT}';
ALTER TABLE g10t ADD CONSTRAINT key_nonneg CHECK (n_nationkey >= 0);
SHOW TBLPROPERTIES g10t;
DELETE FROM g10t WHERE n_nationkey >= 10;
SELECT count(*) AS n FROM g10t;
RESTORE TABLE g10t TO VERSION AS OF 1;
SELECT count(*) AS n FROM g10t;
DESCRIBE HISTORY g10t

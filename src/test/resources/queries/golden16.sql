-- golden execute file 16: INSERT INTO through the exact CLI splitter +
-- context + formatter pipeline — a VALUES insert, a partial-column-list
-- insert whose SELECT source reads the table itself (absent columns
-- null-fill), and follow-up SELECTs reading the refreshed registration.
-- ${DELTA_INS} is substituted by the spec (a fresh writable copy per
-- run — the script MUTATES the table).
CREATE EXTERNAL TABLE g16t STORED AS DELTA
LOCATION '${DELTA_INS}';
INSERT INTO g16t VALUES (90, 'INSERTED-A', 1), (91, 'INSERTED-B', 2);
INSERT INTO g16t (n_nationkey, n_name)
SELECT n_nationkey + 100, concat('COPY-', n_name)
FROM g16t WHERE n_nationkey < 2;
SELECT count(*) AS n FROM g16t;
SELECT n_nationkey, n_name, n_regionkey FROM g16t
WHERE n_nationkey >= 90 ORDER BY n_nationkey

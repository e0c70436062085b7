-- golden execute file 9: table MAINTENANCE as SQL through the exact
-- CLI splitter + context + formatter pipeline — OPTIMIZE … ZORDER BY
-- re-clusters the table on a 2-D Morton key (a real rewrite commit),
-- VACUUM sweeps the replaced files, bare OPTIMIZE compacts to one
-- clustered file — with SELECTs reading the refreshed registration
-- after each step. ${DELTA_MAINT2} is substituted by the spec (a fresh
-- writable copy per run — the script REWRITES the table).
CREATE EXTERNAL TABLE g9t STORED AS DELTA
LOCATION '${DELTA_MAINT2}';
OPTIMIZE g9t ZORDER BY (l_partkey, l_suppkey);
SELECT count(*) AS n FROM g9t;
VACUUM g9t RETAIN 0 HOURS;
OPTIMIZE g9t;
SELECT count(*) AS n, sum(l_partkey) AS psum FROM g9t

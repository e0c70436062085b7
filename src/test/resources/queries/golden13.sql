-- golden execute file 13: zero-copy SHALLOW CLONE through the exact
-- CLI splitter + context + formatter pipeline: clone a registered
-- table, diverge the clone with DELETE (the source must stay whole),
-- then the VERSION AS OF spelling reads the clone's pre-divergence
-- state. ${CLONE_SRC}/${CLONE_DST}/${CLONE_V0} are substituted by the
-- spec (fresh dirs per run).
CREATE EXTERNAL TABLE g13src STORED AS DELTA
LOCATION '${CLONE_SRC}';
CREATE TABLE g13c SHALLOW CLONE g13src LOCATION '${CLONE_DST}';
SELECT count(*) AS n_clone FROM g13c;
DELETE FROM g13c WHERE n_nationkey >= 10;
SELECT count(*) AS n_clone_after FROM g13c;
SELECT count(*) AS n_src FROM g13src;
CREATE TABLE g13v0 SHALLOW CLONE g13c VERSION AS OF 0 LOCATION '${CLONE_V0}';
SELECT count(*) AS n_v0 FROM g13v0

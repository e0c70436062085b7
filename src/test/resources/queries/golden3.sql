-- golden execute file 3: the delta path end-to-end through the same
-- splitter + context + formatter pipeline (DDL, versionAsOf time
-- travel, deletion-vector reads, postgres regex dialect).
-- ${DELTA} / ${DELTA_DV} are substituted with fixture paths by the spec.
CREATE EXTERNAL TABLE g3delta STORED AS DELTA
LOCATION '${DELTA}';
CREATE EXTERNAL TABLE g3delta_v0 STORED AS DELTA
OPTIONS(versionAsOf='0') LOCATION '${DELTA}';
CREATE EXTERNAL TABLE g3dv STORED AS DELTA
LOCATION '${DELTA_DV}';
SELECT count(*) AS n_latest FROM g3delta;
SELECT count(*) AS n_v0 FROM g3delta_v0;
SELECT count(*) AS n_live FROM g3dv;
SELECT n_name FROM g3delta_v0 WHERE n_name ~ '_1$' ORDER BY n_name

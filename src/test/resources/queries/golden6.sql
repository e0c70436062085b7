-- golden execute file 6: the Delta V2-checkpoint path end-to-end
-- through the same splitter + context + formatter pipeline — a
-- UUID-named spec-v2 checkpoint whose file actions live in sidecar
-- parquet files, stitched with a JSON tail that removes one
-- sidecar-declared file. ${DELTA_V2} is substituted by the spec.
CREATE EXTERNAL TABLE g6v2 STORED AS DELTA
LOCATION '${DELTA_V2}';
CREATE EXTERNAL TABLE g6v2_v0 STORED AS DELTA
OPTIONS(versionAsOf='0') LOCATION '${DELTA_V2}';
SELECT count(*) AS n_latest, CAST(min(n_nationkey) AS BIGINT) AS lo FROM g6v2;
SELECT count(*) AS n_v0 FROM g6v2_v0;
SELECT n_name FROM g6v2 WHERE n_nationkey % 8 = 1 ORDER BY n_name

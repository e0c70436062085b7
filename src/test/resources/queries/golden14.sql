-- golden execute file 14: DESCRIBE DETAIL — the table-level metadata
-- window (format, timestamps, partition columns, live-file count/bytes,
-- properties) through the exact CLI splitter + context + formatter
-- pipeline. ${DELTA_DETAIL} is substituted by the spec (a partitioned
-- table carrying one explicit property).
CREATE EXTERNAL TABLE g14t STORED AS DELTA
LOCATION '${DELTA_DETAIL}';
SELECT count(*) AS n FROM g14t;
DESCRIBE DETAIL g14t

-- golden execute file 15: the round-18 statement family through the
-- exact CLI splitter + context + formatter pipeline — a plain parquet
-- table CONVERTs to delta in place, a landing wave COPY INTOs exactly
-- once (the rerun is a published-nothing no-op), the table evolves a
-- column, and the metadata windows report. ${CONVERT_DIR} (partitioned
-- parquet, half the corpus) and ${LANDING} (parquet files carrying the
-- other half) are substituted by the spec.
CREATE EXTERNAL TABLE g15t STORED AS PARQUET
LOCATION '${CONVERT_DIR}';
CONVERT TO DELTA g15t;
COPY INTO g15t FROM '${LANDING}' FILEFORMAT = PARQUET;
COPY INTO g15t FROM '${LANDING}' FILEFORMAT = PARQUET;
SELECT count(*) AS n FROM g15t;
ALTER TABLE g15t ADD COLUMNS (score BIGINT);
SHOW PARTITIONS g15t;
DESCRIBE HISTORY g15t

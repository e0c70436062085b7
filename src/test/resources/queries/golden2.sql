-- golden execute file 2: catalog introspection the way an adt SQL
-- script would do it (information_schema through the same pipeline)
CREATE EXTERNAL TABLE g2nat STORED AS PARQUET
LOCATION '/root/testdata/sf0.001/nation.parquet';
SELECT table_name FROM information_schema.tables
WHERE table_name = 'g2nat';
SELECT count(*) AS n_cols FROM information_schema.columns
WHERE table_name = 'g2nat';
SELECT value AS tz FROM information_schema.df_settings
WHERE name = 'spark.sql.session.timeZone';
EXPLAIN ANALYZE SELECT count(*) AS n FROM g2nat

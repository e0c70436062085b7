-- golden execute file: DDL + aggregation + join
-- comment lines are skipped only at line start
CREATE EXTERNAL TABLE nat STORED AS PARQUET
LOCATION '/root/testdata/sf0.001/nation.parquet';
CREATE EXTERNAL TABLE reg STORED AS PARQUET
LOCATION '/root/testdata/sf0.001/region.parquet';
SELECT r_name, count(*) AS n
FROM nat JOIN reg ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name;
SELECT 'a;b' AS s, 1 + 1 AS two

-- golden execute file 11: property-routed OPTIMIZE through the exact
-- CLI splitter + context + formatter pipeline. The table is tagged
-- with graft.autoOptimize.zOrderCols, so the FIRST matching OPTIMIZE
-- runs the full rewrite (seeding the optimized=zorder tags) and every
-- later one dispatches the INCREMENTAL verb — at steady state it
-- publishes NO commit, which DESCRIBE HISTORY makes visible (same
-- version count before and after). ${DELTA_ROUTED} is substituted by
-- the spec (a fresh writable copy per run).
CREATE EXTERNAL TABLE g11t STORED AS DELTA
LOCATION '${DELTA_ROUTED}';
ALTER TABLE g11t SET TBLPROPERTIES
  ('graft.autoOptimize.zOrderCols'='l_partkey,l_suppkey');
OPTIMIZE g11t ZORDER BY (l_partkey, l_suppkey);
SELECT count(*) AS n FROM g11t;
OPTIMIZE g11t ZORDER BY (l_partkey, l_suppkey);
DESCRIBE HISTORY g11t

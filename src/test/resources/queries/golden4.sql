-- golden execute file 4: the postgres-dialect surface end-to-end
-- through the splitter + SqlCompat rewrite + context + formatter —
-- regex operators, case-insensitive variants, SIMILAR TO with SQL
-- escapes, and standard-conforming string literals (backslash is a
-- literal character, matching the reference's postgres sqlparser
-- dialect). ${NATION} is substituted with the fixture path by the spec.
CREATE EXTERNAL TABLE g4nat STORED AS PARQUET
LOCATION '${NATION}';
SELECT count(*) AS n_tilde FROM g4nat WHERE n_name ~ 'NATION_2[0-9]$';
SELECT count(*) AS n_not FROM g4nat WHERE n_name !~ '[0-9]$';
SELECT count(*) AS n_ci FROM g4nat WHERE n_name ~* '^nation_1$';
SELECT count(*) AS n_ilike FROM g4nat WHERE n_name ~~* 'nation\__';
SELECT count(*) AS n_sim FROM g4nat
WHERE n_name SIMILAR TO 'NATION\_(1|2)[0-9]';
SELECT '100%' SIMILAR TO '100\%' AS pct_lit

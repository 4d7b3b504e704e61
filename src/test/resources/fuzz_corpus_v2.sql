-- Seeded fuzz corpus v2: seed 20260815, 400 queries. Regenerable via SqlFuzzer;
-- FuzzSpec asserts the generator reproduces this file byte-identically.
WITH base AS (SELECT s_nationkey FROM supplier WHERE length(s_name) < 14) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_suppkey, count(*) AS fz_cnt FROM supplier WHERE (s_acctbal > 6731.61 OR s_acctbal >= 4730.92) GROUP BY s_suppkey) AS dt
SELECT CASE WHEN n_name NOT LIKE '%j%' THEN n_regionkey ELSE -5 END AS fz0, substring(n_name, 1, 5) AS fz1, lower(n_name) AS fz2 FROM nation WHERE ((n_regionkey IN (128, 130, 48, 45) OR n_regionkey BETWEEN 1234 AND 1298) OR n_nationkey IN (162, 183, 45))
SELECT c_custkey * 3 AS fz0, n_regionkey FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderkey DESC) AS fzw FROM orders WHERE length(o_orderstatus) < 16) AS dt WHERE fzw <= 4
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk WHERE (n_name NOT LIKE '%b%' OR n_regionkey IN (58, 110))
SELECT n_regionkey AS fz_k FROM nation WHERE (n_nationkey BETWEEN 1035 AND 1232 AND n_regionkey BETWEEN 701 AND 821) UNION SELECT r_regionkey AS fz_k FROM region WHERE r_regionkey > 775
SELECT n_regionkey, count(*) AS fz_cnt FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE s_suppkey IN (158, 71, 80, 67, 52) GROUP BY n_regionkey
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_nationkey AS fzg, sum(s_nationkey) OVER (PARTITION BY s_nationkey) AS fzw FROM supplier) AS dt WHERE fk + 5 < 1808
WITH agg AS (SELECT c_nationkey AS fzk, count(*) AS fz_cnt, min(c_custkey) AS fz_min FROM customer WHERE c_mktsegment LIKE 'l%' GROUP BY c_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk WHERE (n_regionkey BETWEEN 455 AND 681 OR n_name LIKE 'w%')
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_nationkey IN (187, 21, 18, 184, 198)) UNION SELECT s_nationkey AS fz_k FROM supplier WHERE (s_nationkey <> 1097 AND s_suppkey + 1 < 1723)
SELECT n_nationkey, count(*) AS fz_cnt, min(c_custkey) AS fz_min, sum(c_nationkey) AS fz_sum, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_nationkey
SELECT fk, fzg, fzw FROM (SELECT c_custkey AS fk, c_nationkey AS fzg, sum(c_nationkey) OVER (PARTITION BY c_nationkey) AS fzw FROM customer) AS dt WHERE fk = 1029
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation WHERE (n_name NOT LIKE '%p%' OR n_regionkey < 633) GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk WHERE (r_regionkey >= 713 AND r_regionkey = 813)
SELECT c_nationkey AS fz_k FROM customer WHERE c_custkey BETWEEN 448 AND 606 UNION SELECT s_nationkey AS fz_k FROM supplier WHERE (length(s_name) > 12 OR s_acctbal <= 2805.30)
SELECT r_regionkey, count(*) AS fz_cnt, min(n_regionkey) AS fz_min, max(n_regionkey) AS fz_max FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (n_nationkey IN (147, 21, 95, 30) OR n_name NOT LIKE '%b%') GROUP BY r_regionkey
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, lag(n_regionkey, 1, -1) OVER (PARTITION BY n_nationkey ORDER BY n_nationkey) AS fzw FROM nation WHERE (n_nationkey + 4 < 1946 AND n_nationkey BETWEEN 725 AND 781)) AS dt WHERE fk BETWEEN 150 AND 402
WITH base AS (SELECT length(s_name) AS fz0, s_acctbal, s_nationkey, s_suppkey FROM supplier WHERE (s_acctbal <= 584.92 AND s_acctbal <= 4932.70)) SELECT * FROM base
SELECT c_nationkey AS fz_k FROM customer WHERE (c_nationkey + 5 < 722 AND c_custkey IN (107, 151, 25)) UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (s_acctbal < 5761.98)
SELECT CASE WHEN o_totalprice > 8657.14 THEN o_orderkey ELSE -6 END AS fz0, abs(o_custkey - 75) AS fz1 FROM orders WHERE (NOT (o_custkey BETWEEN 699 AND 844) AND (o_orderpriority NOT LIKE '%i%' AND o_orderstatus NOT LIKE '%k%'))
SELECT c_name, count(*) AS fz_cnt, min(o_custkey) AS fz_min FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_name
SELECT fk, fzg, fzw FROM (SELECT c_custkey AS fk, c_custkey AS fzg, count(c_nationkey) OVER (PARTITION BY c_custkey) AS fzw FROM customer) AS dt WHERE fk BETWEEN 294 AND 540
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer GROUP BY c_nationkey) AS dt WHERE fz_cnt > 0
SELECT s_nationkey + 7 AS fz0, s_name FROM supplier WHERE NOT (NOT (s_suppkey > 3)) ORDER BY s_suppkey DESC LIMIT 7
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, lag(n_regionkey, 1, -1) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS fzw FROM nation WHERE (n_nationkey IN (114, 20, 83, 70, 130) AND n_name NOT LIKE '%c%')) AS dt WHERE fk IN (66, 146, 21, 44)
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation WHERE n_regionkey < 1185 GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_partkey, count(*) AS fz_cnt FROM part WHERE p_partkey + 9 < 445 GROUP BY p_partkey) AS dt WHERE fz_cnt > 0
SELECT DISTINCT s_name, s_name AS fzd1, s_acctbal FROM supplier WHERE NOT (NOT (s_suppkey BETWEEN 655 AND 812))
SELECT fk, fzg, fzw FROM (SELECT p_partkey AS fk, p_partkey AS fzg, max(p_size) OVER (PARTITION BY p_partkey) AS fzw FROM part) AS dt WHERE fk BETWEEN 60 AND 180
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk WHERE (c_mktsegment LIKE 'h%' AND c_acctbal <= 5910.21)
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_custkey, count(*) AS fz_cnt FROM orders WHERE NOT (length(o_orderstatus) < 14) GROUP BY o_custkey) AS dt WHERE fz_cnt > 2
SELECT CASE WHEN n_nationkey >= 1198 THEN n_nationkey ELSE -1 END AS fz0, s_name || '_x' AS fz1 FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE (n_nationkey + 2 < 859 OR n_regionkey + 6 < 1346)
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, lead(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS fzw FROM orders WHERE NOT (o_totalprice >= 8544.24)) AS dt WHERE fk <= 934
WITH base AS (SELECT p_brand, p_size FROM part WHERE (length(p_brand) >= 11 AND p_partkey IN (81, 30, 88, 31))) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_nationkey, count(*) AS fz_cnt FROM supplier GROUP BY s_nationkey) AS dt WHERE fz_cnt > 3
SELECT n_regionkey AS fz_k FROM nation WHERE (n_nationkey + 2 < 45 AND n_nationkey BETWEEN 1028 AND 1202) UNION SELECT r_regionkey AS fz_k FROM region WHERE (r_name LIKE 'e%' AND r_regionkey BETWEEN 621 AND 939)
SELECT r_name, count(*) AS fz_cnt, min(n_nationkey) AS fz_min, max(n_nationkey) AS fz_max FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (n_name NOT LIKE '%s%' OR n_regionkey + 6 < 751) GROUP BY r_name
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey DESC) AS fzw FROM nation WHERE (n_regionkey BETWEEN 1439 AND 1729 OR n_nationkey <= 1420)) AS dt WHERE fzw <= 2
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders WHERE (o_custkey BETWEEN 285 AND 685 AND o_orderstatus LIKE 's%') GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk WHERE c_custkey IN (36, 13, 136, 73, 4)
SELECT n_regionkey AS fz_k FROM nation WHERE (n_regionkey >= 1788 OR n_name NOT LIKE '%i%') UNION SELECT r_regionkey AS fz_k FROM region WHERE NOT (r_name LIKE 'y%')
SELECT c_mktsegment, count(*) AS fz_cnt, max(o_custkey) AS fz_max, sum(o_custkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lead(p_size, 1, -1) OVER (PARTITION BY p_partkey ORDER BY p_partkey) AS fzw FROM part WHERE (p_name LIKE 'j%' OR p_name NOT LIKE '%t%')) AS dt WHERE fk + 1 < 1418
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier WHERE NOT (s_nationkey IN (172, 193)) GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk WHERE (n_regionkey BETWEEN 1276 AND 1633 OR n_regionkey BETWEEN 1319 AND 1474)
SELECT n_regionkey AS fz_k FROM nation WHERE (n_nationkey = 1179 AND n_nationkey + 1 < 283) UNION SELECT r_regionkey AS fz_k FROM region WHERE r_name LIKE 'e%'
SELECT n_nationkey, count(*) AS fz_cnt, max(s_suppkey) AS fz_max, sum(s_suppkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE (s_nationkey + 7 < 757 OR s_suppkey BETWEEN 1225 AND 1601) GROUP BY n_nationkey HAVING count(*) > 1
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderkey) AS fzw FROM orders WHERE (o_orderkey + 4 < 302 AND o_orderstatus NOT LIKE '%v%')) AS dt WHERE fzw <= 3
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk
SELECT abs(o_orderkey - 53) AS fz0 FROM orders WHERE NOT ((o_orderstatus NOT LIKE '%v%' OR o_orderstatus LIKE 'j%'))
SELECT r_regionkey, count(*) AS fz_cnt, min(n_regionkey) AS fz_min, sum(n_regionkey) AS fz_sum FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_regionkey HAVING count(*) > 3
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, lead(s_nationkey, 1, -1) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE (s_acctbal < 2132.22 AND s_acctbal <= 5340.86)) AS dt WHERE fk IN (26, 1)
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_nationkey, count(*) AS fz_cnt FROM supplier GROUP BY s_nationkey) AS dt
SELECT r_regionkey, count(*) AS fz_cnt, min(n_nationkey) AS fz_min, max(n_regionkey) AS fz_max, sum(n_regionkey) AS fz_sum FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (n_regionkey = 1619 AND n_nationkey BETWEEN 58 AND 306) GROUP BY r_regionkey
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, row_number() OVER (PARTITION BY n_nationkey ORDER BY n_nationkey DESC) AS fzw FROM nation WHERE NOT (n_regionkey + 2 < 1752)) AS dt WHERE fzw <= 4
WITH base AS (SELECT upper(p_name) AS fz0, p_retailprice FROM part WHERE p_type LIKE 't%') SELECT * FROM base
SELECT c_nationkey AS fz_k FROM customer WHERE (c_name LIKE 'm%' AND c_nationkey + 6 < 513) INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_suppkey IN (80, 91, 198, 25, 3) OR s_nationkey > 1847)
SELECT n_nationkey, count(*) AS fz_cnt, min(n_nationkey) AS fz_min, max(n_nationkey) AS fz_max FROM nation GROUP BY n_nationkey HAVING count(*) > 0
SELECT fk, fzg, fzw FROM (SELECT p_partkey AS fk, p_partkey AS fzg, min(p_size) OVER (PARTITION BY p_partkey) AS fzw FROM part) AS dt WHERE fk IN (25, 142, 134, 0)
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier WHERE (s_suppkey + 7 < 145 OR s_suppkey + 1 < 54) GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk WHERE n_regionkey BETWEEN 1205 AND 1411
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_custkey + 7 < 983) EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE (length(s_name) > 17 AND length(s_name) > 19)
SELECT c_mktsegment, count(*) AS fz_cnt, sum(c_custkey) AS fz_sum, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer WHERE (c_nationkey IN (173, 137, 122, 73) AND c_custkey BETWEEN 7 AND 154) GROUP BY c_mktsegment
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS fzw FROM orders WHERE (o_totalprice > 3404.17 OR length(o_orderstatus) >= 8)) AS dt WHERE fzw <= 4
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation WHERE (n_regionkey <= 1718 AND n_regionkey BETWEEN 743 AND 896) GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk WHERE r_regionkey + 6 < 784
SELECT substring(n_name, 1, 3) AS fz0, n_nationkey + 8 AS fz1, abs(n_nationkey - 45) AS fz2 FROM nation WHERE NOT ((length(n_name) > 6 AND n_regionkey IN (123, 170, 105, 143))) ORDER BY n_nationkey DESC LIMIT 35
SELECT c_custkey, count(*) AS fz_cnt, max(c_nationkey) AS fz_max FROM customer GROUP BY c_custkey HAVING count(*) > 2
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, lead(s_nationkey, 1, -1) OVER (PARTITION BY s_suppkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE (s_name NOT LIKE '%z%' AND length(s_name) < 13)) AS dt WHERE fk + 4 < 114
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer WHERE c_custkey BETWEEN 1251 AND 1309 GROUP BY c_nationkey) AS dt
SELECT n_nationkey * 2 AS fz0, n_name, abs(n_regionkey - 18) AS fz2 FROM nation WHERE length(n_name) <= 8
SELECT n_name || '_x' AS fz0, n_name FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, lead(s_suppkey, 1, -1) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE NOT (s_name NOT LIKE '%r%')) AS dt WHERE fk IN (131, 190, 182)
WITH base AS (SELECT abs(r_regionkey - 17) AS fz0, r_regionkey FROM region WHERE (length(r_name) >= 16 AND r_name LIKE 'c%')) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_custkey, count(*) AS fz_cnt FROM customer GROUP BY c_custkey) AS dt
SELECT o_orderkey - 4 AS fz0 FROM orders INNER JOIN customer ON o_custkey = c_custkey
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderkey) AS fzw FROM orders WHERE length(o_orderstatus) >= 8) AS dt WHERE fzw <= 3
WITH base AS (SELECT CASE WHEN c_custkey IN (54, 6, 113) THEN c_custkey ELSE -8 END AS fz0, abs(c_nationkey - 80) AS fz1, c_acctbal FROM customer WHERE c_name LIKE 'u%') SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_regionkey, count(*) AS fz_cnt FROM nation WHERE (n_regionkey + 1 < 1099 AND n_regionkey BETWEEN 842 AND 1156) GROUP BY n_regionkey) AS dt WHERE fz_cnt > 2
SELECT c_nationkey FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE (length(c_mktsegment) >= 6 OR c_acctbal <= 6140.64)
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, lag(s_suppkey, 1, -1) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE NOT (s_nationkey + 7 < 812)) AS dt WHERE fk IN (54, 48, 3)
WITH base AS (SELECT s_nationkey + 8 AS fz0, length(s_name) AS fz1, lower(s_name) AS fz2, abs(s_nationkey - 93) AS fz3 FROM supplier WHERE (s_name NOT LIKE '%u%' AND s_suppkey BETWEEN 300 AND 377)) SELECT * FROM base
SELECT n_regionkey AS fz_k FROM nation WHERE NOT (n_regionkey BETWEEN 672 AND 730) INTERSECT SELECT r_regionkey AS fz_k FROM region WHERE r_name LIKE 'q%'
SELECT abs(c_custkey - 2) AS fz0, c_name, abs(c_custkey - 64) AS fz2 FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE NOT (c_custkey > 1766)
SELECT fk, fzw FROM (SELECT c_custkey AS fk, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey DESC) AS fzw FROM customer WHERE NOT (c_custkey <> 922)) AS dt WHERE fzw <= 3
WITH base AS (SELECT abs(s_nationkey - 75) AS fz0 FROM supplier WHERE (s_nationkey IN (55, 60, 130, 92) AND s_acctbal < 1715.50)) SELECT * FROM base
SELECT c_nationkey AS fz_k FROM customer WHERE (c_custkey IN (48, 45) OR c_nationkey IN (108, 197, 82)) INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE s_suppkey >= 894
SELECT fk, fzg, fzw FROM (SELECT o_orderkey AS fk, o_custkey AS fzg, max(o_custkey) OVER (PARTITION BY o_custkey) AS fzw FROM orders) AS dt WHERE fk <> 238
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_suppkey, count(*) AS fz_cnt FROM supplier WHERE (length(s_name) <= 16 OR length(s_name) >= 18) GROUP BY s_suppkey) AS dt
SELECT n_regionkey + 7 AS fz0, c_mktsegment || '_x' AS fz1, abs(c_custkey - 49) AS fz2 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (c_custkey BETWEEN 559 AND 707 AND c_acctbal <= 1062.75)
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_suppkey AS fzg, max(s_suppkey) OVER (PARTITION BY s_suppkey) AS fzw FROM supplier) AS dt WHERE fk BETWEEN 632 AND 844
WITH agg AS (SELECT c_nationkey AS fzk, count(*) AS fz_cnt, min(c_custkey) AS fz_min FROM customer WHERE c_acctbal > 7999.92 GROUP BY c_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk
SELECT c_nationkey AS fz_k FROM customer WHERE (c_mktsegment NOT LIKE '%q%' OR c_custkey IN (151, 50, 137, 92)) UNION SELECT s_nationkey AS fz_k FROM supplier WHERE (s_acctbal >= 8929.35 AND s_suppkey < 123)
SELECT c_custkey, c_custkey + 1 AS fz1, CASE WHEN c_mktsegment LIKE 'w%' THEN c_nationkey ELSE -1 END AS fz2 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (c_nationkey BETWEEN 504 AND 649 AND c_acctbal >= 1816.54)
SELECT fk, fzw FROM (SELECT c_custkey AS fk, lead(c_custkey, 1, -1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS fzw FROM customer WHERE (c_mktsegment LIKE 'k%' OR c_name LIKE 's%')) AS dt WHERE fk + 6 < 1389
WITH base AS (SELECT o_orderkey - 4 AS fz0, o_orderstatus || '_x' AS fz1, CASE WHEN o_totalprice < 2181.4 THEN o_custkey ELSE -3 END AS fz2, o_orderpriority || '_x' AS fz3 FROM orders WHERE o_orderstatus NOT LIKE '%p%') SELECT * FROM base
SELECT c_nationkey AS fz_k FROM customer WHERE (c_nationkey < 1652 AND c_acctbal > 7133.29) UNION SELECT s_nationkey AS fz_k FROM supplier WHERE (s_name LIKE 'b%' OR length(s_name) >= 14)
SELECT c_acctbal, abs(n_nationkey - 32) AS fz1, CASE WHEN n_regionkey >= 1087 THEN n_nationkey ELSE -2 END AS fz2 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (length(c_mktsegment) <= 10 AND length(c_mktsegment) < 16)
SELECT fk, fzg, fzw FROM (SELECT n_nationkey AS fk, n_regionkey AS fzg, count(n_nationkey) OVER (PARTITION BY n_regionkey) AS fzw FROM nation) AS dt WHERE fk IN (4, 138, 155, 47, 181)
WITH base AS (SELECT CASE WHEN length(r_name) < 9 THEN r_regionkey ELSE -8 END AS fz0, r_regionkey, r_name, length(r_name) AS fz3 FROM region WHERE r_regionkey + 1 < 822) SELECT * FROM base
SELECT o_custkey AS fz_k FROM orders WHERE o_custkey + 8 < 281 UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE length(c_name) <= 14
SELECT p_type, count(*) AS fz_cnt, max(p_partkey) AS fz_max, sum(CAST(p_retailprice AS DECIMAL(18,2))) AS fz_dsum FROM part GROUP BY p_type
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS fzw FROM orders WHERE (o_orderkey + 9 < 334 OR o_totalprice > 6645.4)) AS dt WHERE fzw <= 4
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation WHERE (n_nationkey <= 1191 AND n_regionkey BETWEEN 988 AND 1185) GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_regionkey, count(*) AS fz_cnt FROM nation GROUP BY n_regionkey) AS dt
SELECT CASE WHEN p_type NOT LIKE '%p%' THEN p_partkey ELSE -5 END AS fz0, CASE WHEN p_partkey > 178 THEN p_size ELSE -5 END AS fz1, upper(p_brand) AS fz2, p_size - 2 AS fz3 FROM part WHERE p_size IN (131, 98)
SELECT fk, fzw FROM (SELECT c_custkey AS fk, lag(c_nationkey, 1, -1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS fzw FROM customer WHERE (c_nationkey <= 871 AND c_custkey = 77)) AS dt WHERE fk <> 356
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier WHERE (s_name NOT LIKE '%j%' OR s_nationkey + 1 < 66) GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk WHERE n_nationkey BETWEEN 418 AND 575
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_partkey, count(*) AS fz_cnt FROM part GROUP BY p_partkey) AS dt WHERE fz_cnt > 1
SELECT p_brand || '_x' AS fz0 FROM part WHERE p_retailprice > 721.27
SELECT fk, fzg, fzw FROM (SELECT n_nationkey AS fk, n_nationkey AS fzg, min(n_regionkey) OVER (PARTITION BY n_nationkey) AS fzw FROM nation) AS dt WHERE fk + 6 < 1444
WITH agg AS (SELECT c_nationkey AS fzk, count(*) AS fz_cnt, min(c_custkey) AS fz_min FROM customer WHERE (length(c_name) <= 6 AND c_custkey IN (142, 92, 5, 18, 19)) GROUP BY c_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk WHERE n_regionkey + 4 < 1186
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_nationkey, count(*) AS fz_cnt FROM supplier WHERE (s_acctbal >= 2383.58 OR s_acctbal >= 2262.93) GROUP BY s_nationkey) AS dt
SELECT o_totalprice, o_orderstatus FROM orders WHERE (o_custkey IN (159, 178) OR o_orderstatus LIKE 'v%') ORDER BY o_orderkey DESC LIMIT 28
SELECT fk, fzw FROM (SELECT p_partkey AS fk, row_number() OVER (PARTITION BY p_size ORDER BY p_partkey) AS fzw FROM part WHERE (p_partkey + 1 < 1529 OR p_brand LIKE 'e%')) AS dt WHERE fzw <= 2
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer WHERE NOT (c_mktsegment LIKE 'i%') GROUP BY c_nationkey) AS dt
SELECT CASE WHEN length(n_name) >= 19 THEN n_regionkey ELSE -3 END AS fz0 FROM nation INNER JOIN region ON n_regionkey = r_regionkey WHERE length(r_name) <= 11
WITH base AS (SELECT o_orderstatus FROM orders WHERE (o_custkey BETWEEN 607 AND 970 AND o_orderpriority LIKE 'r%')) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_nationkey, count(*) AS fz_cnt FROM nation WHERE (length(n_name) <= 8 OR n_name LIKE 'e%') GROUP BY n_nationkey) AS dt
SELECT c_name, upper(c_name) AS fz1, c_nationkey FROM customer WHERE c_nationkey >= 482
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_nationkey AS fzg, count(s_suppkey) OVER (PARTITION BY s_nationkey) AS fzw FROM supplier) AS dt WHERE fk > 1224
WITH base AS (SELECT n_regionkey, n_regionkey AS fzd1 FROM nation WHERE NOT (n_nationkey BETWEEN 223 AND 541)) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_custkey, count(*) AS fz_cnt FROM orders GROUP BY o_custkey) AS dt
SELECT DISTINCT CASE WHEN c_custkey = 798 THEN c_custkey ELSE 0 END AS fz0, c_nationkey * 4 AS fz1, lower(c_mktsegment) AS fz2, c_name FROM customer WHERE (NOT (c_custkey + 6 < 287) AND (c_acctbal > 4079.24 AND length(c_name) < 14))
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS fzw FROM orders WHERE (o_orderstatus NOT LIKE '%u%' AND length(o_orderpriority) > 19)) AS dt WHERE fzw <= 5
WITH base AS (SELECT CASE WHEN length(n_name) <= 9 THEN n_regionkey ELSE -6 END AS fz0, n_regionkey, n_nationkey FROM nation WHERE NOT (n_nationkey IN (192, 117, 73, 18))) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_nationkey, count(*) AS fz_cnt FROM supplier GROUP BY s_nationkey) AS dt
SELECT o_orderkey - 4 AS fz0, o_orderkey * 6 AS fz1, o_orderpriority FROM orders JOIN customer ON o_custkey = c_custkey WHERE NOT (c_nationkey + 8 < 1866)
SELECT fk, fzw FROM (SELECT c_custkey AS fk, lag(c_nationkey, 1, -1) OVER (PARTITION BY c_custkey ORDER BY c_custkey) AS fzw FROM customer WHERE NOT (c_acctbal > 4980.58)) AS dt WHERE fk BETWEEN 254 AND 560
WITH base AS (SELECT lower(n_name) AS fz0, CASE WHEN n_name NOT LIKE '%o%' THEN n_nationkey ELSE -4 END AS fz1, abs(n_regionkey - 51) AS fz2, upper(n_name) AS fz3 FROM nation WHERE (length(n_name) >= 13 AND n_regionkey + 3 < 1235)) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_custkey, count(*) AS fz_cnt FROM customer WHERE c_acctbal >= 6551.64 GROUP BY c_custkey) AS dt WHERE fz_cnt > 2
SELECT o_totalprice, c_acctbal, CASE WHEN length(o_orderstatus) >= 10 THEN o_orderkey ELSE -4 END AS fz2 FROM orders LEFT JOIN customer ON o_custkey = c_custkey WHERE NOT (o_totalprice > 5046.23)
SELECT fk, fzg, fzw FROM (SELECT n_nationkey AS fk, n_regionkey AS fzg, sum(n_regionkey) OVER (PARTITION BY n_regionkey) AS fzw FROM nation) AS dt WHERE fk IN (190, 58, 162)
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lag(p_partkey, 1, -1) OVER (PARTITION BY p_partkey ORDER BY p_partkey) AS fzw FROM part WHERE (length(p_type) < 6 OR p_partkey + 6 < 1014)) AS dt WHERE fk < 1853
WITH base AS (SELECT upper(n_name) AS fz0 FROM nation WHERE (n_name NOT LIKE '%p%' OR n_name NOT LIKE '%p%')) SELECT * FROM base
SELECT c_nationkey AS fz_k FROM customer WHERE c_name NOT LIKE '%x%' UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (s_acctbal <= 3146.86)
SELECT r_regionkey, count(*) AS fz_cnt FROM region WHERE (r_regionkey IN (6, 65) AND r_regionkey <> 632) GROUP BY r_regionkey
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, lag(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS fzw FROM orders WHERE (o_orderkey IN (156, 176, 140, 111, 47) AND o_custkey + 5 < 631)) AS dt WHERE fk >= 535
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_orderkey, count(*) AS fz_cnt FROM orders GROUP BY o_orderkey) AS dt
SELECT c_nationkey AS fz_k FROM customer WHERE (c_mktsegment NOT LIKE '%r%' AND length(c_mktsegment) < 5) UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE s_name NOT LIKE '%d%'
SELECT c_nationkey, count(*) AS fz_cnt, min(c_custkey) AS fz_min, sum(c_nationkey) AS fz_sum FROM customer GROUP BY c_nationkey HAVING count(*) > 2
SELECT fk, fzw FROM (SELECT p_partkey AS fk, row_number() OVER (PARTITION BY p_size ORDER BY p_partkey DESC) AS fzw FROM part WHERE NOT (p_partkey + 1 < 750)) AS dt WHERE fzw <= 4
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_nationkey, count(*) AS fz_cnt FROM supplier WHERE (s_suppkey + 6 < 1864 OR s_suppkey BETWEEN 330 AND 604) GROUP BY s_nationkey) AS dt WHERE fz_cnt > 2
SELECT CASE WHEN c_acctbal >= 5887.20 THEN c_custkey ELSE -9 END AS fz0 FROM customer WHERE NOT (length(c_name) >= 10)
SELECT s_nationkey, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, max(s_nationkey) AS fz_max FROM supplier GROUP BY s_nationkey
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, lag(o_custkey, 1, -1) OVER (PARTITION BY o_orderkey ORDER BY o_orderkey) AS fzw FROM orders WHERE o_orderstatus NOT LIKE '%i%') AS dt WHERE fk > 922
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer WHERE NOT (c_custkey + 3 < 1437) GROUP BY c_nationkey) AS dt WHERE fz_cnt > 3
SELECT substring(c_name, 1, 3) AS fz0, c_nationkey * 9 AS fz1 FROM customer WHERE ((c_mktsegment LIKE 'n%' AND c_acctbal >= 2331.6) OR NOT (c_custkey + 9 < 1379))
SELECT s_nationkey, count(*) AS fz_cnt, sum(s_nationkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier WHERE (s_nationkey + 6 < 1712 OR length(s_name) > 8) GROUP BY s_nationkey
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_suppkey AS fzg, min(s_nationkey) OVER (PARTITION BY s_suppkey) AS fzw FROM supplier) AS dt WHERE fk <> 1667
WITH base AS (SELECT upper(s_name) AS fz0, s_suppkey, abs(s_suppkey - 98) AS fz2 FROM supplier WHERE (s_nationkey < 1351 AND length(s_name) > 17)) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer GROUP BY c_nationkey) AS dt
SELECT o_orderstatus, o_custkey - 9 AS fz1, o_orderkey, lower(o_orderpriority) AS fz3 FROM orders WHERE o_orderstatus NOT LIKE '%e%' ORDER BY o_orderkey LIMIT 34
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, lag(o_custkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS fzw FROM orders WHERE NOT (o_orderstatus LIKE 'y%')) AS dt WHERE fk > 846
WITH base AS (SELECT abs(p_size - 1) AS fz0, abs(p_partkey - 81) AS fz1, p_size - 3 AS fz2 FROM part WHERE NOT (p_type LIKE 'g%')) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_nationkey, count(*) AS fz_cnt FROM nation GROUP BY n_nationkey) AS dt WHERE fz_cnt > 1
SELECT n_regionkey, upper(s_name) AS fz1 FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_suppkey AS fzg, max(s_nationkey) OVER (PARTITION BY s_suppkey) AS fzw FROM supplier) AS dt WHERE fk IN (61, 110, 58)
WITH base AS (SELECT CASE WHEN r_regionkey BETWEEN 52 AND 163 THEN r_regionkey ELSE -2 END AS fz0, r_regionkey * 8 AS fz1, r_regionkey - 3 AS fz2, abs(r_regionkey - 92) AS fz3 FROM region WHERE r_regionkey BETWEEN 1116 AND 1406) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_partkey, count(*) AS fz_cnt FROM part WHERE NOT (p_partkey BETWEEN 1278 AND 1554) GROUP BY p_partkey) AS dt WHERE fz_cnt > 2
SELECT c_custkey, o_orderstatus FROM orders INNER JOIN customer ON o_custkey = c_custkey
SELECT fk, fzw FROM (SELECT c_custkey AS fk, row_number() OVER (PARTITION BY c_custkey ORDER BY c_custkey) AS fzw FROM customer WHERE NOT (c_nationkey BETWEEN 1025 AND 1315)) AS dt WHERE fzw <= 1
WITH base AS (SELECT r_regionkey + 8 AS fz0 FROM region WHERE (r_name NOT LIKE '%s%' AND r_regionkey IN (115, 125))) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_custkey, count(*) AS fz_cnt FROM orders WHERE (length(o_orderpriority) > 12 OR o_totalprice < 3951.90) GROUP BY o_custkey) AS dt
SELECT abs(o_custkey - 94) AS fz0 FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE (c_name LIKE 'q%' AND c_acctbal < 5947.1)
SELECT n_nationkey, count(*) AS fz_cnt, sum(c_nationkey) AS fz_sum, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_nationkey
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lead(p_size, 1, -1) OVER (PARTITION BY p_size ORDER BY p_partkey) AS fzw FROM part WHERE (p_size + 3 < 932 AND length(p_type) > 6)) AS dt WHERE fk = 1456
WITH base AS (SELECT substring(s_name, 1, 1) AS fz0, abs(s_nationkey - 44) AS fz1 FROM supplier WHERE s_nationkey < 860) SELECT * FROM base
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_acctbal < 6297.87) UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE (length(s_name) <= 18 AND s_suppkey >= 955)
SELECT r_name, count(*) AS fz_cnt, sum(n_regionkey) AS fz_sum FROM nation JOIN region ON n_regionkey = r_regionkey WHERE n_nationkey + 6 < 1732 GROUP BY r_name
SELECT fk, fzg, fzw FROM (SELECT o_orderkey AS fk, o_orderkey AS fzg, max(o_custkey) OVER (PARTITION BY o_orderkey) AS fzw FROM orders) AS dt WHERE fk < 194
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_size, count(*) AS fz_cnt FROM part WHERE (p_size IN (114, 159, 59) AND p_name LIKE 'm%') GROUP BY p_size) AS dt
SELECT o_orderkey, substring(o_orderstatus, 1, 4) AS fz1 FROM orders WHERE NOT (o_totalprice >= 6106.95) ORDER BY o_orderkey DESC LIMIT 31
SELECT n_name, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, sum(s_nationkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name HAVING count(*) > 0
SELECT fk, fzw FROM (SELECT p_partkey AS fk, row_number() OVER (PARTITION BY p_size ORDER BY p_partkey) AS fzw FROM part WHERE (p_type NOT LIKE '%e%' AND p_brand NOT LIKE '%q%')) AS dt WHERE fzw <= 4
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_orderkey, count(*) AS fz_cnt FROM orders WHERE o_totalprice <= 3621.10 GROUP BY o_orderkey) AS dt WHERE fz_cnt > 1
SELECT o_orderstatus || '_x' AS fz0, o_orderstatus, o_totalprice FROM orders WHERE o_custkey IN (28, 139, 197, 173)
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, lag(o_custkey, 1, -1) OVER (PARTITION BY o_orderkey ORDER BY o_orderkey) AS fzw FROM orders WHERE NOT (length(o_orderpriority) >= 12)) AS dt WHERE fk + 7 < 208
WITH base AS (SELECT CASE WHEN c_nationkey >= 384 THEN c_custkey ELSE -1 END AS fz0, abs(c_custkey - 97) AS fz1 FROM customer WHERE length(c_name) <= 14) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_suppkey, count(*) AS fz_cnt FROM supplier WHERE (s_acctbal >= 7253.8 AND s_suppkey IN (148, 131, 180)) GROUP BY s_suppkey) AS dt
SELECT o_orderkey - 7 AS fz0, o_custkey, o_orderpriority || '_x' AS fz2 FROM orders WHERE (o_orderkey IN (197, 105) OR NOT (length(o_orderstatus) > 7))
SELECT fk, fzw FROM (SELECT c_custkey AS fk, row_number() OVER (PARTITION BY c_custkey ORDER BY c_custkey) AS fzw FROM customer WHERE c_custkey BETWEEN 1194 AND 1288) AS dt WHERE fzw <= 5
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_custkey, count(*) AS fz_cnt FROM orders GROUP BY o_custkey) AS dt WHERE fz_cnt > 3
SELECT r_name || '_x' AS fz0, r_regionkey, CASE WHEN r_regionkey < 627 THEN r_regionkey ELSE -9 END AS fz2, r_regionkey * 4 AS fz3 FROM region WHERE r_regionkey <= 1829
SELECT p_name, count(*) AS fz_cnt, sum(p_partkey) AS fz_sum, sum(CAST(p_retailprice AS DECIMAL(18,2))) AS fz_dsum FROM part GROUP BY p_name
SELECT fk, fzg, fzw FROM (SELECT p_partkey AS fk, p_partkey AS fzg, max(p_partkey) OVER (PARTITION BY p_partkey) AS fzw FROM part) AS dt WHERE fk IN (167, 108, 79, 75)
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_suppkey, count(*) AS fz_cnt FROM supplier GROUP BY s_suppkey) AS dt
SELECT DISTINCT p_size * 2 AS fz0, abs(p_size - 24) AS fz1, p_name, CASE WHEN p_size < 1525 THEN p_size ELSE -2 END AS fz3 FROM part WHERE ((p_partkey BETWEEN 76 AND 273 OR p_type NOT LIKE '%f%') AND p_brand NOT LIKE '%l%')
SELECT c_nationkey, count(*) AS fz_cnt, sum(c_custkey) AS fz_sum FROM customer GROUP BY c_nationkey
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders WHERE (o_custkey + 6 < 340 AND o_orderkey > 1372) GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_custkey, count(*) AS fz_cnt FROM customer WHERE c_name LIKE 'y%' GROUP BY c_custkey) AS dt
SELECT CASE WHEN length(p_name) <= 12 THEN p_size ELSE -9 END AS fz0 FROM part WHERE p_partkey + 2 < 252
SELECT c_nationkey, count(*) AS fz_cnt, min(c_custkey) AS fz_min, max(c_custkey) AS fz_max, sum(c_custkey) AS fz_sum FROM customer WHERE c_nationkey = 216 GROUP BY c_nationkey
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier WHERE NOT (s_name NOT LIKE '%d%') GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_nationkey, count(*) AS fz_cnt FROM supplier WHERE (s_acctbal <= 6190.6 OR s_nationkey IN (70, 26, 126, 86, 94)) GROUP BY s_nationkey) AS dt
SELECT substring(p_type, 1, 3) AS fz0, p_size FROM part WHERE NOT ((p_partkey IN (79, 119) AND p_size BETWEEN 1339 AND 1396)) ORDER BY p_partkey LIMIT 12
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lead(p_partkey, 1, -1) OVER (PARTITION BY p_partkey ORDER BY p_partkey) AS fzw FROM part WHERE (p_retailprice >= 7096.80 AND p_name NOT LIKE '%y%')) AS dt WHERE fk >= 274
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, lead(n_regionkey, 1, -1) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS fzw FROM nation WHERE n_regionkey >= 671) AS dt WHERE fk < 446
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_name LIKE 'i%') INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE s_suppkey BETWEEN 1080 AND 1311
SELECT CASE WHEN o_custkey BETWEEN 524 AND 839 THEN o_orderkey ELSE -5 END AS fz0, abs(c_custkey - 2) AS fz1, c_nationkey + 2 AS fz2 FROM orders INNER JOIN customer ON o_custkey = c_custkey
SELECT fk, fzw FROM (SELECT p_partkey AS fk, row_number() OVER (PARTITION BY p_partkey ORDER BY p_partkey DESC) AS fzw FROM part WHERE NOT (length(p_name) >= 5)) AS dt WHERE fzw <= 2
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier WHERE s_suppkey + 4 < 1787 GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk WHERE (n_regionkey IN (86, 182) OR n_nationkey IN (107, 87))
SELECT c_nationkey AS fz_k FROM customer WHERE (length(c_name) <= 6 OR c_nationkey < 1461) EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_suppkey BETWEEN 416 AND 808 OR s_suppkey IN (20, 94, 122))
SELECT lower(r_name) AS fz0, CASE WHEN length(n_name) < 9 THEN n_regionkey ELSE -5 END AS fz1 FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderkey DESC) AS fzw FROM orders WHERE o_orderkey BETWEEN 901 AND 918) AS dt WHERE fzw <= 4
WITH agg AS (SELECT c_nationkey AS fzk, count(*) AS fz_cnt, min(c_custkey) AS fz_min FROM customer WHERE (c_mktsegment NOT LIKE '%c%' AND c_mktsegment LIKE 'l%') GROUP BY c_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_nationkey IN (47, 14)) EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_acctbal < 4245.76 AND s_acctbal >= 8812.28)
SELECT o_orderstatus, count(*) AS fz_cnt, max(o_orderkey) AS fz_max, sum(o_custkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders WHERE o_totalprice >= 399.56 GROUP BY o_orderstatus
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_nationkey AS fzg, min(s_suppkey) OVER (PARTITION BY s_nationkey) AS fzw FROM supplier) AS dt WHERE fk BETWEEN 810 AND 1184
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders WHERE o_orderkey > 922 GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk
SELECT c_nationkey AS fz_k FROM customer WHERE c_acctbal >= 2342.88 EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_acctbal > 618.31 AND length(s_name) <= 12)
SELECT p_size, count(*) AS fz_cnt, min(p_size) AS fz_min, sum(p_partkey) AS fz_sum FROM part WHERE p_name NOT LIKE '%m%' GROUP BY p_size HAVING count(*) > 1
WITH base AS (SELECT o_orderkey * 6 AS fz0 FROM orders WHERE (o_orderkey IN (60, 140, 120, 96, 17) OR o_custkey BETWEEN 832 AND 1172)) SELECT * FROM base
SELECT o_custkey AS fz_k FROM orders WHERE o_orderpriority NOT LIKE '%k%' UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE NOT (c_acctbal >= 895.17)
SELECT length(s_name) AS fz0, abs(s_nationkey - 82) AS fz1 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lead(p_size, 1, -1) OVER (PARTITION BY p_size ORDER BY p_partkey) AS fzw FROM part WHERE (p_partkey BETWEEN 304 AND 483 OR p_partkey BETWEEN 630 AND 1018)) AS dt WHERE fk BETWEEN 881 AND 909
WITH base AS (SELECT CASE WHEN o_custkey IN (182, 46) THEN o_custkey ELSE -2 END AS fz0 FROM orders WHERE NOT (o_totalprice <= 6329.18)) SELECT * FROM base
SELECT o_custkey AS fz_k FROM orders WHERE o_custkey < 527 UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE c_custkey BETWEEN 577 AND 874
SELECT s_nationkey * 5 AS fz0, s_suppkey + 1 AS fz1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
SELECT fk, fzg, fzw FROM (SELECT o_orderkey AS fk, o_orderkey AS fzg, count(o_custkey) OVER (PARTITION BY o_orderkey) AS fzw FROM orders) AS dt WHERE fk IN (153, 27, 86)
WITH base AS (SELECT substring(p_type, 1, 1) AS fz0, substring(p_type, 1, 3) AS fz1 FROM part WHERE NOT (p_partkey + 3 < 171)) SELECT * FROM base
SELECT o_custkey AS fz_k FROM orders WHERE NOT (length(o_orderstatus) <= 11) INTERSECT SELECT c_custkey AS fz_k FROM customer WHERE c_name NOT LIKE '%e%'
SELECT p_brand, count(*) AS fz_cnt, max(p_partkey) AS fz_max FROM part WHERE p_partkey <= 1346 GROUP BY p_brand HAVING count(*) > 0
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lead(p_size, 1, -1) OVER (PARTITION BY p_partkey ORDER BY p_partkey) AS fzw FROM part WHERE (length(p_brand) <= 18 AND p_size + 2 < 1206)) AS dt WHERE fk BETWEEN 723 AND 806
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer WHERE (length(c_mktsegment) >= 17 AND c_nationkey BETWEEN 1009 AND 1162) GROUP BY c_nationkey) AS dt
SELECT CASE WHEN s_name LIKE 'i%' THEN s_nationkey ELSE -3 END AS fz0, CASE WHEN s_nationkey BETWEEN 253 AND 509 THEN s_nationkey ELSE -6 END AS fz1 FROM supplier WHERE NOT ((s_name NOT LIKE '%i%' OR s_nationkey > 890)) ORDER BY s_suppkey LIMIT 33
SELECT r_name, count(*) AS fz_cnt, min(r_regionkey) AS fz_min FROM region GROUP BY r_name
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, lag(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS fzw FROM orders WHERE o_custkey + 5 < 499) AS dt WHERE fk <= 922
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk WHERE (r_regionkey = 999 AND r_regionkey IN (26, 144, 11))
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_custkey, count(*) AS fz_cnt FROM customer WHERE (c_name LIKE 'c%' AND c_acctbal < 8870.50) GROUP BY c_custkey) AS dt
SELECT p_partkey, p_partkey + 5 AS fz1, p_name FROM part WHERE p_partkey = 794
SELECT fk, fzg, fzw FROM (SELECT o_orderkey AS fk, o_orderkey AS fzg, sum(o_orderkey) OVER (PARTITION BY o_orderkey) AS fzw FROM orders) AS dt WHERE fk IN (41, 107, 78, 111, 118)
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk WHERE (c_nationkey IN (13, 104, 33, 16) AND c_nationkey BETWEEN 844 AND 955)
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_nationkey, count(*) AS fz_cnt FROM nation GROUP BY n_nationkey) AS dt
SELECT abs(c_custkey - 48) AS fz0 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (c_custkey < 1967 AND c_acctbal > 8827.33)
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, row_number() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey DESC) AS fzw FROM supplier WHERE length(s_name) >= 9) AS dt WHERE fzw <= 5
WITH base AS (SELECT abs(n_regionkey - 17) AS fz0, CASE WHEN n_regionkey BETWEEN 376 AND 664 THEN n_nationkey ELSE -4 END AS fz1, abs(n_regionkey - 77) AS fz2 FROM nation WHERE n_regionkey + 3 < 226) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_size, count(*) AS fz_cnt FROM part GROUP BY p_size) AS dt
SELECT CASE WHEN n_name LIKE 'b%' THEN n_nationkey ELSE -5 END AS fz0, c_custkey, CASE WHEN c_custkey BETWEEN 683 AND 1035 THEN c_nationkey ELSE -5 END AS fz2 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (c_nationkey IN (160, 118, 154, 187) AND c_mktsegment LIKE 'l%')
SELECT fk, fzg, fzw FROM (SELECT c_custkey AS fk, c_custkey AS fzg, min(c_nationkey) OVER (PARTITION BY c_custkey) AS fzw FROM customer) AS dt WHERE fk = 1386
WITH base AS (SELECT upper(n_name) AS fz0, length(n_name) AS fz1, abs(n_regionkey - 74) AS fz2, n_nationkey + 8 AS fz3 FROM nation WHERE NOT (n_regionkey IN (152, 75, 8, 148, 135))) SELECT * FROM base
SELECT o_custkey AS fz_k FROM orders WHERE o_custkey >= 357 UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE length(c_mktsegment) <= 5
SELECT n_regionkey - 9 AS fz0, n_nationkey, CASE WHEN n_regionkey + 2 < 187 THEN n_nationkey ELSE -9 END AS fz2 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE (s_nationkey BETWEEN 609 AND 839 OR s_acctbal <= 396.24)
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, row_number() OVER (PARTITION BY n_nationkey ORDER BY n_nationkey) AS fzw FROM nation WHERE n_nationkey BETWEEN 959 AND 1359) AS dt WHERE fzw <= 1
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_nationkey, count(*) AS fz_cnt FROM nation WHERE NOT (n_nationkey = 953) GROUP BY n_nationkey) AS dt
SELECT CASE WHEN n_nationkey + 4 < 1846 THEN n_nationkey ELSE -8 END AS fz0, CASE WHEN n_nationkey < 572 THEN n_nationkey ELSE -9 END AS fz1, r_regionkey - 8 AS fz2 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (n_nationkey + 2 < 357 OR n_nationkey = 1829)
SELECT fk, fzg, fzw FROM (SELECT p_partkey AS fk, p_size AS fzg, count(p_partkey) OVER (PARTITION BY p_size) AS fzw FROM part) AS dt WHERE fk >= 1166
WITH base AS (SELECT CASE WHEN p_partkey IN (116, 59, 73, 107) THEN p_size ELSE -1 END AS fz0, CASE WHEN p_partkey IN (151, 106, 46, 164) THEN p_size ELSE 0 END AS fz1, p_name, p_size * 3 AS fz3 FROM part WHERE (p_name NOT LIKE '%g%' AND p_size IN (99, 84))) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_partkey, count(*) AS fz_cnt FROM part WHERE p_brand NOT LIKE '%s%' GROUP BY p_partkey) AS dt WHERE fz_cnt > 0
SELECT length(n_name) AS fz0, r_regionkey - 2 AS fz1 FROM nation JOIN region ON n_regionkey = r_regionkey
SELECT fk, fzg, fzw FROM (SELECT o_orderkey AS fk, o_custkey AS fzg, sum(o_orderkey) OVER (PARTITION BY o_custkey) AS fzw FROM orders) AS dt WHERE fk BETWEEN 1148 AND 1488
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk WHERE NOT (c_custkey < 1087)
SELECT o_custkey AS fz_k FROM orders WHERE o_custkey IN (197, 111, 146, 193) EXCEPT SELECT c_custkey AS fz_k FROM customer WHERE (c_nationkey BETWEEN 1136 AND 1222 OR length(c_name) <= 4)
SELECT r_regionkey FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (n_regionkey IN (187, 169, 174, 193) OR n_regionkey = 1139)
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, lag(s_suppkey, 1, -1) OVER (PARTITION BY s_suppkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE NOT (s_suppkey IN (25, 137, 169, 108, 68))) AS dt WHERE fk + 9 < 137
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk
SELECT n_regionkey AS fz_k FROM nation WHERE n_nationkey BETWEEN 323 AND 405 EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE length(r_name) < 8
SELECT c_custkey, n_regionkey + 5 AS fz1 FROM customer JOIN nation ON c_nationkey = n_nationkey
SELECT fk, fzg, fzw FROM (SELECT c_custkey AS fk, c_custkey AS fzg, min(c_nationkey) OVER (PARTITION BY c_custkey) AS fzw FROM customer) AS dt WHERE fk IN (133, 24, 106, 55)
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_regionkey, count(*) AS fz_cnt FROM nation WHERE length(n_name) >= 5 GROUP BY n_regionkey) AS dt
SELECT s_name || '_x' AS fz0, s_acctbal, s_name FROM supplier WHERE (NOT (s_acctbal > 5776.27) OR (s_nationkey BETWEEN 520 AND 608 AND s_acctbal > 6021.53)) ORDER BY s_suppkey DESC LIMIT 25
SELECT r_name, count(*) AS fz_cnt, min(r_regionkey) AS fz_min FROM region GROUP BY r_name
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, row_number() OVER (PARTITION BY s_suppkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE s_suppkey IN (119, 81, 44, 2)) AS dt WHERE fzw <= 4
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_orderkey, count(*) AS fz_cnt FROM orders GROUP BY o_orderkey) AS dt
SELECT c_nationkey, c_name, c_mktsegment, c_mktsegment || '_x' AS fz3 FROM customer WHERE NOT ((c_name LIKE 'w%' AND c_acctbal < 361.7))
SELECT s_nationkey, count(*) AS fz_cnt, max(s_suppkey) AS fz_max, sum(s_nationkey) AS fz_sum FROM supplier GROUP BY s_nationkey
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, lag(n_nationkey, 1, -1) OVER (PARTITION BY n_nationkey ORDER BY n_nationkey) AS fzw FROM nation WHERE n_nationkey BETWEEN 1481 AND 1594) AS dt WHERE fk + 7 < 655
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_nationkey, count(*) AS fz_cnt FROM supplier GROUP BY s_nationkey) AS dt
SELECT CASE WHEN length(c_mktsegment) < 10 THEN c_nationkey ELSE -7 END AS fz0 FROM customer WHERE (NOT (length(c_name) < 8) OR (c_mktsegment NOT LIKE '%k%' OR c_acctbal >= 1776.18))
SELECT fk, fzg, fzw FROM (SELECT c_custkey AS fk, c_nationkey AS fzg, max(c_custkey) OVER (PARTITION BY c_nationkey) AS fzw FROM customer) AS dt WHERE fk + 4 < 372
WITH base AS (SELECT upper(o_orderstatus) AS fz0, o_orderkey * 5 AS fz1 FROM orders WHERE o_custkey BETWEEN 470 AND 562) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer GROUP BY c_nationkey) AS dt
SELECT c_nationkey - 3 AS fz0 FROM customer WHERE c_name LIKE 'w%'
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, row_number() OVER (PARTITION BY n_nationkey ORDER BY n_nationkey DESC) AS fzw FROM nation WHERE NOT (n_name NOT LIKE '%n%')) AS dt WHERE fzw <= 1
WITH base AS (SELECT o_custkey, o_orderkey, abs(o_custkey - 10) AS fz2 FROM orders WHERE o_totalprice >= 2388.26) SELECT * FROM base
SELECT r_regionkey, count(*) AS fz_cnt FROM region WHERE (r_regionkey >= 1012 AND r_name NOT LIKE '%i%') GROUP BY r_regionkey
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lag(p_partkey, 1, -1) OVER (PARTITION BY p_partkey ORDER BY p_partkey) AS fzw FROM part WHERE (length(p_name) < 15 OR p_retailprice >= 6722.91)) AS dt WHERE fk + 5 < 1828
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_custkey, count(*) AS fz_cnt FROM orders WHERE NOT (length(o_orderstatus) < 19) GROUP BY o_custkey) AS dt
SELECT DISTINCT r_name, r_regionkey, abs(r_regionkey - 91) AS fz2 FROM region WHERE (length(r_name) > 5 OR NOT (length(r_name) < 14))
SELECT n_nationkey, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, sum(s_nationkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE (s_name LIKE 'f%' AND length(s_name) < 13) GROUP BY n_nationkey
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, lag(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS fzw FROM orders WHERE (o_totalprice > 2443.90 OR o_custkey IN (24, 59, 131))) AS dt WHERE fk + 2 < 1393
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_suppkey, count(*) AS fz_cnt FROM supplier GROUP BY s_suppkey) AS dt
SELECT length(r_name) AS fz0, length(r_name) AS fz1, r_regionkey, r_regionkey AS fzd3 FROM region WHERE NOT (r_regionkey > 1452)
SELECT fk, fzw FROM (SELECT p_partkey AS fk, row_number() OVER (PARTITION BY p_partkey ORDER BY p_partkey DESC) AS fzw FROM part WHERE NOT (p_retailprice < 4259.30)) AS dt WHERE fzw <= 1
WITH base AS (SELECT lower(n_name) AS fz0, upper(n_name) AS fz1, length(n_name) AS fz2 FROM nation WHERE NOT (n_name LIKE 'q%')) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer GROUP BY c_nationkey) AS dt
SELECT r_name FROM region WHERE ((r_name NOT LIKE '%b%' OR length(r_name) >= 13) AND r_name LIKE 'k%') ORDER BY r_regionkey LIMIT 9
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderkey) AS fzw FROM orders WHERE (o_orderkey + 3 < 1012 AND o_orderpriority LIKE 'j%')) AS dt WHERE fzw <= 3
WITH base AS (SELECT c_nationkey * 8 AS fz0, c_mktsegment || '_x' AS fz1, abs(c_nationkey - 78) AS fz2, c_name FROM customer WHERE c_mktsegment NOT LIKE '%d%') SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_regionkey, count(*) AS fz_cnt FROM nation WHERE n_regionkey <= 1813 GROUP BY n_regionkey) AS dt
SELECT r_regionkey, abs(r_regionkey - 25) AS fz1 FROM region WHERE r_regionkey BETWEEN 1408 AND 1746
SELECT n_nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE length(s_name) > 18
SELECT fk, fzg, fzw FROM (SELECT c_custkey AS fk, c_custkey AS fzg, max(c_nationkey) OVER (PARTITION BY c_custkey) AS fzw FROM customer) AS dt WHERE fk IN (19, 16, 35, 193)
WITH base AS (SELECT lower(n_name) AS fz0 FROM nation WHERE (n_regionkey BETWEEN 458 AND 762 AND length(n_name) <= 19)) SELECT * FROM base
SELECT o_custkey AS fz_k FROM orders WHERE o_custkey >= 1658 UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE (c_custkey > 903 OR c_nationkey + 7 < 921)
SELECT CASE WHEN c_name LIKE 's%' THEN c_nationkey ELSE -9 END AS fz0 FROM orders JOIN customer ON o_custkey = c_custkey WHERE NOT (length(c_mktsegment) < 8)
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_suppkey AS fzg, max(s_suppkey) OVER (PARTITION BY s_suppkey) AS fzw FROM supplier) AS dt WHERE fk + 6 < 1992
WITH base AS (SELECT n_regionkey, abs(n_nationkey - 10) AS fz1 FROM nation WHERE (n_nationkey > 831 OR length(n_name) >= 19)) SELECT * FROM base
SELECT o_custkey AS fz_k FROM orders WHERE length(o_orderpriority) > 14 UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE NOT (c_mktsegment NOT LIKE '%o%')
SELECT s_name, count(*) AS fz_cnt, min(s_nationkey) AS fz_min FROM supplier GROUP BY s_name
SELECT fk, fzw FROM (SELECT c_custkey AS fk, lead(c_custkey, 1, -1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS fzw FROM customer WHERE NOT (c_custkey BETWEEN 1100 AND 1203)) AS dt WHERE fk + 4 < 1658
WITH base AS (SELECT c_mktsegment, c_name, c_nationkey FROM customer WHERE length(c_name) < 9) SELECT * FROM base
SELECT o_custkey AS fz_k FROM orders WHERE (o_orderstatus NOT LIKE '%c%' AND o_orderstatus NOT LIKE '%s%') INTERSECT SELECT c_custkey AS fz_k FROM customer WHERE (length(c_name) < 12 OR c_nationkey + 7 < 673)
SELECT s_nationkey, count(*) AS fz_cnt, max(s_suppkey) AS fz_max, sum(s_nationkey) AS fz_sum FROM supplier GROUP BY s_nationkey
SELECT fk, fzg, fzw FROM (SELECT n_nationkey AS fk, n_nationkey AS fzg, count(n_nationkey) OVER (PARTITION BY n_nationkey) AS fzw FROM nation) AS dt WHERE fk <= 1138
WITH base AS (SELECT CASE WHEN o_custkey IN (144, 58, 185) THEN o_orderkey ELSE -6 END AS fz0, o_orderpriority, o_custkey FROM orders WHERE o_orderstatus LIKE 'x%') SELECT * FROM base
SELECT n_regionkey AS fz_k FROM nation WHERE NOT (n_nationkey BETWEEN 264 AND 621) INTERSECT SELECT r_regionkey AS fz_k FROM region WHERE r_name NOT LIKE '%j%'
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, lag(s_nationkey, 1, -1) OVER (PARTITION BY s_suppkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE (s_acctbal > 2220.49 AND s_nationkey BETWEEN 884 AND 1138)) AS dt WHERE fk BETWEEN 825 AND 1109
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier WHERE (s_suppkey IN (38, 134, 16) AND s_nationkey + 7 < 1274) GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk
SELECT n_regionkey AS fz_k FROM nation WHERE (n_regionkey IN (25, 158, 11, 29, 110) AND n_regionkey IN (36, 60, 14, 193)) UNION SELECT r_regionkey AS fz_k FROM region WHERE NOT (r_regionkey >= 64)
SELECT abs(n_regionkey - 79) AS fz0 FROM customer INNER JOIN nation ON c_nationkey = n_nationkey
SELECT fk, fzg, fzw FROM (SELECT c_custkey AS fk, c_custkey AS fzg, min(c_nationkey) OVER (PARTITION BY c_custkey) AS fzw FROM customer) AS dt WHERE fk <= 918
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk
SELECT n_regionkey AS fz_k FROM nation WHERE (n_name NOT LIKE '%v%' OR n_nationkey BETWEEN 1373 AND 1585) UNION SELECT r_regionkey AS fz_k FROM region WHERE (r_regionkey < 1813 OR r_name NOT LIKE '%p%')
SELECT c_custkey, count(*) AS fz_cnt, max(o_custkey) AS fz_max, sum(o_orderkey) AS fz_sum FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_custkey
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey DESC) AS fzw FROM nation WHERE (n_regionkey + 5 < 233 AND n_nationkey IN (148, 120))) AS dt WHERE fzw <= 5
WITH base AS (SELECT abs(p_partkey - 14) AS fz0, p_size FROM part WHERE NOT (length(p_brand) > 4)) SELECT * FROM base
SELECT n_regionkey AS fz_k FROM nation WHERE n_regionkey >= 704 UNION SELECT r_regionkey AS fz_k FROM region WHERE (r_name LIKE 'n%' OR r_name LIKE 's%')
SELECT n_nationkey, count(*) AS fz_cnt, min(s_nationkey) AS fz_min, max(s_nationkey) AS fz_max, sum(s_suppkey) AS fz_sum FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_nationkey
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lead(p_partkey, 1, -1) OVER (PARTITION BY p_partkey ORDER BY p_partkey) AS fzw FROM part WHERE (p_retailprice <= 8415.37 OR p_size + 7 < 705)) AS dt WHERE fk > 118
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_size, count(*) AS fz_cnt FROM part WHERE NOT (p_brand LIKE 's%') GROUP BY p_size) AS dt WHERE fz_cnt > 0
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_custkey < 351) UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE (s_nationkey BETWEEN 920 AND 1228 OR s_acctbal >= 4367.78)
SELECT n_name, count(*) AS fz_cnt, min(c_nationkey) AS fz_min, max(c_custkey) AS fz_max, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE length(c_name) > 6 GROUP BY n_name
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_nationkey AS fzg, count(s_suppkey) OVER (PARTITION BY s_nationkey) AS fzw FROM supplier) AS dt WHERE fk BETWEEN 928 AND 1134
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_partkey, count(*) AS fz_cnt FROM part WHERE (p_retailprice > 1556.19 AND p_size <> 986) GROUP BY p_partkey) AS dt
SELECT CASE WHEN length(o_orderpriority) <= 15 THEN o_custkey ELSE -7 END AS fz0, o_totalprice, abs(o_orderkey - 70) AS fz2 FROM orders WHERE ((o_totalprice < 8594.9 AND length(o_orderstatus) <= 16) OR length(o_orderstatus) <= 17)
SELECT fk, fzw FROM (SELECT c_custkey AS fk, row_number() OVER (PARTITION BY c_custkey ORDER BY c_custkey DESC) AS fzw FROM customer WHERE (c_mktsegment NOT LIKE '%f%' OR c_custkey IN (193, 116, 1, 29))) AS dt WHERE fzw <= 2
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_orderkey, count(*) AS fz_cnt FROM orders WHERE o_custkey BETWEEN 928 AND 1077 GROUP BY o_orderkey) AS dt
SELECT r_regionkey, r_regionkey AS fzd1 FROM nation INNER JOIN region ON n_regionkey = r_regionkey
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lag(p_size, 1, -1) OVER (PARTITION BY p_partkey ORDER BY p_partkey) AS fzw FROM part WHERE (length(p_name) > 4 AND p_brand LIKE 'o%')) AS dt WHERE fk IN (82, 76, 165)
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation WHERE (n_regionkey BETWEEN 1322 AND 1567 AND n_nationkey + 9 < 230) GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk WHERE r_name LIKE 'h%'
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer GROUP BY c_nationkey) AS dt
SELECT abs(r_regionkey - 10) AS fz0 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (r_regionkey BETWEEN 81 AND 274 AND length(r_name) < 17)
SELECT fk, fzg, fzw FROM (SELECT o_orderkey AS fk, o_custkey AS fzg, sum(o_custkey) OVER (PARTITION BY o_custkey) AS fzw FROM orders) AS dt WHERE fk + 4 < 1772
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders WHERE o_totalprice >= 1337.13 GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk WHERE (length(c_mktsegment) >= 6 OR c_name LIKE 't%')
SELECT n_regionkey AS fz_k FROM nation WHERE n_regionkey BETWEEN 1027 AND 1125 EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE NOT (r_regionkey + 6 < 878)
SELECT CASE WHEN c_custkey BETWEEN 694 AND 774 THEN c_custkey ELSE -2 END AS fz0 FROM customer INNER JOIN nation ON c_nationkey = n_nationkey
WITH base AS (SELECT p_size, p_name, p_partkey + 4 AS fz2, p_brand FROM part WHERE p_retailprice > 4553.95) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT p_size, count(*) AS fz_cnt FROM part WHERE (p_name NOT LIKE '%o%' OR p_type LIKE 'p%') GROUP BY p_size) AS dt
SELECT s_name, abs(n_nationkey - 70) AS fz1 FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey
SELECT fk, fzw FROM (SELECT c_custkey AS fk, lead(c_custkey, 1, -1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS fzw FROM customer WHERE c_acctbal > 2962.28) AS dt WHERE fk IN (106, 198)
WITH base AS (SELECT CASE WHEN length(r_name) >= 9 THEN r_regionkey ELSE -6 END AS fz0, r_name, r_name AS fzd2, r_regionkey + 3 AS fz3 FROM region WHERE (r_regionkey BETWEEN 702 AND 991 AND length(r_name) >= 8)) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_custkey, count(*) AS fz_cnt FROM orders WHERE o_totalprice > 8888.85 GROUP BY o_custkey) AS dt WHERE fz_cnt > 1
SELECT s_name FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE s_acctbal < 4085.62
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, row_number() OVER (PARTITION BY s_suppkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE NOT (length(s_name) > 16)) AS dt WHERE fzw <= 3
WITH base AS (SELECT r_regionkey + 8 AS fz0 FROM region WHERE (r_regionkey BETWEEN 192 AND 447 OR length(r_name) > 18)) SELECT * FROM base
SELECT c_nationkey AS fz_k FROM customer WHERE (c_custkey BETWEEN 1473 AND 1502 OR c_nationkey > 1387) INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE s_acctbal > 6150.46
SELECT CASE WHEN c_nationkey IN (31, 99) THEN c_custkey ELSE -2 END AS fz0, c_acctbal, o_totalprice FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE (o_orderkey + 8 < 1443 AND o_custkey = 903)
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, lead(n_nationkey, 1, -1) OVER (PARTITION BY n_nationkey ORDER BY n_nationkey) AS fzw FROM nation WHERE n_nationkey + 3 < 840) AS dt WHERE fk = 1087
WITH base AS (SELECT s_acctbal, abs(s_nationkey - 60) AS fz1 FROM supplier WHERE s_suppkey + 7 < 1152) SELECT * FROM base
SELECT c_nationkey AS fz_k FROM customer WHERE (length(c_name) < 14 OR c_mktsegment NOT LIKE '%i%') INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_nationkey IN (199, 114, 110) AND s_nationkey BETWEEN 284 AND 453)
SELECT o_orderstatus || '_x' AS fz0, o_totalprice, o_totalprice AS fzd2 FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE (length(c_name) <= 14 OR length(c_name) > 16)
SELECT fk, fzg, fzw FROM (SELECT p_partkey AS fk, p_size AS fzg, count(p_size) OVER (PARTITION BY p_size) AS fzw FROM part) AS dt WHERE fk BETWEEN 1148 AND 1446
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderkey DESC) AS fzw FROM orders WHERE NOT (o_orderstatus LIKE 'e%')) AS dt WHERE fzw <= 1
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_orderkey, count(*) AS fz_cnt FROM orders WHERE o_custkey IN (25, 178, 87) GROUP BY o_orderkey) AS dt
SELECT n_nationkey, n_regionkey FROM nation WHERE n_regionkey + 9 < 976
SELECT c_name, count(*) AS fz_cnt, max(o_orderkey) AS fz_max, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_name
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, lead(s_suppkey, 1, -1) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS fzw FROM supplier WHERE (s_suppkey + 1 < 1446 OR s_suppkey IN (171, 198, 31))) AS dt WHERE fk BETWEEN 1193 AND 1521
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_nationkey, count(*) AS fz_cnt FROM supplier WHERE NOT (s_acctbal > 1616.51) GROUP BY s_nationkey) AS dt WHERE fz_cnt > 0
SELECT abs(n_regionkey - 96) AS fz0, n_regionkey + 9 AS fz1, upper(n_name) AS fz2 FROM nation WHERE (n_name NOT LIKE '%n%' OR (n_regionkey IN (182, 117, 87, 61, 69) OR n_regionkey BETWEEN 93 AND 439))
SELECT n_name, count(*) AS fz_cnt, max(s_suppkey) AS fz_max FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE (s_acctbal <= 7478.63 OR s_suppkey IN (60, 130)) GROUP BY n_name
WITH base AS (SELECT CASE WHEN c_custkey > 1748 THEN c_nationkey ELSE -5 END AS fz0, c_nationkey + 6 AS fz1 FROM customer WHERE (c_mktsegment NOT LIKE '%y%' AND length(c_mktsegment) <= 16)) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer GROUP BY c_nationkey) AS dt WHERE fz_cnt > 3
SELECT n_regionkey + 7 AS fz0, n_regionkey - 7 AS fz1, n_nationkey + 8 AS fz2, n_nationkey FROM nation WHERE NOT ((n_nationkey = 21 AND n_regionkey BETWEEN 1165 AND 1245)) ORDER BY n_nationkey DESC LIMIT 10
SELECT fk, fzg, fzw FROM (SELECT o_orderkey AS fk, o_orderkey AS fzg, min(o_orderkey) OVER (PARTITION BY o_orderkey) AS fzw FROM orders) AS dt WHERE fk IN (185, 133, 63, 129)
WITH base AS (SELECT substring(s_name, 1, 2) AS fz0, lower(s_name) AS fz1, s_acctbal FROM supplier WHERE (s_suppkey = 1427 OR s_suppkey = 837)) SELECT * FROM base
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_nationkey, count(*) AS fz_cnt FROM nation GROUP BY n_nationkey) AS dt WHERE fz_cnt > 3
SELECT n_name, abs(n_nationkey - 19) AS fz1, length(n_name) AS fz2, n_nationkey - 4 AS fz3 FROM nation WHERE (n_regionkey <> 884 OR n_regionkey IN (43, 97, 38, 49, 161)) ORDER BY n_nationkey DESC LIMIT 20
SELECT fk, fzw FROM (SELECT s_suppkey AS fk, row_number() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey DESC) AS fzw FROM supplier WHERE (s_suppkey IN (45, 160, 162, 40) AND s_nationkey <= 918)) AS dt WHERE fzw <= 3
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT s_suppkey, count(*) AS fz_cnt FROM supplier GROUP BY s_suppkey) AS dt
SELECT c_mktsegment FROM customer WHERE (c_mktsegment LIKE 'w%' AND (length(c_name) >= 5 AND c_nationkey BETWEEN 1431 AND 1452))
SELECT c_nationkey, count(*) AS fz_cnt, min(c_nationkey) AS fz_min, max(c_nationkey) AS fz_max, sum(c_custkey) AS fz_sum FROM customer WHERE c_acctbal <= 7645.55 GROUP BY c_nationkey HAVING count(*) > 3
SELECT fk, fzg, fzw FROM (SELECT p_partkey AS fk, p_partkey AS fzg, max(p_size) OVER (PARTITION BY p_partkey) AS fzw FROM part) AS dt WHERE fk = 210
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_nationkey, count(*) AS fz_cnt FROM customer WHERE c_name LIKE 't%' GROUP BY c_nationkey) AS dt WHERE fz_cnt > 2
SELECT DISTINCT abs(c_nationkey - 11) AS fz0, c_name FROM customer WHERE (NOT (c_nationkey BETWEEN 1086 AND 1222) OR (c_acctbal < 7100.20 OR c_custkey <> 701))
SELECT fk, fzw FROM (SELECT n_nationkey AS fk, row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS fzw FROM nation WHERE n_regionkey BETWEEN 538 AND 683) AS dt WHERE fzw <= 1
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders WHERE NOT (o_orderkey BETWEEN 51 AND 283) GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk WHERE (c_name LIKE 'g%' OR length(c_name) >= 5)
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT n_regionkey, count(*) AS fz_cnt FROM nation WHERE (n_name LIKE 'i%' AND length(n_name) > 9) GROUP BY n_regionkey) AS dt
SELECT DISTINCT c_mktsegment, abs(c_nationkey - 66) AS fz1, c_acctbal FROM customer WHERE c_nationkey > 442
SELECT fk, fzw FROM (SELECT p_partkey AS fk, lag(p_size, 1, -1) OVER (PARTITION BY p_partkey ORDER BY p_partkey) AS fzw FROM part WHERE (p_retailprice <= 5448.38 OR length(p_type) <= 4)) AS dt WHERE fk IN (48, 97, 106)
WITH agg AS (SELECT c_nationkey AS fzk, count(*) AS fz_cnt, min(c_custkey) AS fz_min FROM customer GROUP BY c_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT c_custkey, count(*) AS fz_cnt FROM customer GROUP BY c_custkey) AS dt WHERE fz_cnt > 3
SELECT n_nationkey, c_name, n_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (length(c_name) >= 11 AND c_mktsegment NOT LIKE '%q%')
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS fzw FROM orders WHERE (o_custkey BETWEEN 173 AND 452 AND o_custkey IN (32, 29))) AS dt WHERE fzw <= 2
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk
WITH agg AS (SELECT s_nationkey AS fzk, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier WHERE NOT (s_name NOT LIKE '%j%') GROUP BY s_nationkey) SELECT n_nationkey, fz_cnt, fz_min FROM nation JOIN agg ON n_nationkey = fzk
SELECT c_nationkey AS fz_k FROM customer WHERE c_nationkey BETWEEN 1161 AND 1505 EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_nationkey BETWEEN 897 AND 1148 AND s_suppkey + 9 < 1400)
SELECT o_orderkey * 7 AS fz0, c_nationkey * 8 AS fz1, c_acctbal FROM orders LEFT JOIN customer ON o_custkey = c_custkey
SELECT fk, fzw FROM (SELECT o_orderkey AS fk, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderkey DESC) AS fzw FROM orders WHERE (o_custkey = 853 OR o_orderkey + 4 < 174)) AS dt WHERE fzw <= 4
WITH agg AS (SELECT n_regionkey AS fzk, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation WHERE (n_name NOT LIKE '%o%' OR n_name NOT LIKE '%f%') GROUP BY n_regionkey) SELECT r_regionkey, fz_cnt, fz_min FROM region JOIN agg ON r_regionkey = fzk WHERE (r_name LIKE 'g%' OR r_name NOT LIKE '%q%')
SELECT c_nationkey AS fz_k FROM customer WHERE c_mktsegment LIKE 'z%' EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE s_acctbal >= 7313.75
SELECT o_orderstatus, count(*) AS fz_cnt FROM orders WHERE o_orderkey IN (192, 125) GROUP BY o_orderstatus HAVING count(*) > 3
SELECT fk, fzg, fzw FROM (SELECT s_suppkey AS fk, s_suppkey AS fzg, sum(s_nationkey) OVER (PARTITION BY s_suppkey) AS fzw FROM supplier) AS dt WHERE fk IN (91, 130, 35, 136, 98)
WITH agg AS (SELECT o_custkey AS fzk, count(*) AS fz_cnt, min(o_orderkey) AS fz_min FROM orders GROUP BY o_custkey) SELECT c_custkey, fz_cnt, fz_min FROM customer JOIN agg ON c_custkey = fzk WHERE c_custkey BETWEEN 285 AND 643
SELECT substring(o_orderstatus, 1, 1) AS fz0, substring(o_orderpriority, 1, 2) AS fz1, o_orderkey + 9 AS fz2, o_orderpriority FROM orders WHERE length(o_orderpriority) >= 19
SELECT p_brand, count(*) AS fz_cnt, max(p_size) AS fz_max FROM part GROUP BY p_brand
SELECT fk, fzw FROM (SELECT c_custkey AS fk, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS fzw FROM customer WHERE (c_nationkey IN (66, 15, 196, 2) AND length(c_name) > 13)) AS dt WHERE fzw <= 4
SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi FROM (SELECT o_custkey, count(*) AS fz_cnt FROM orders GROUP BY o_custkey) AS dt

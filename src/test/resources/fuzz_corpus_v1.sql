-- Seeded fuzz corpus v1: seed 20260814, 600 queries. Regenerable via SqlFuzzer.corpus();
-- FuzzSpec asserts the generator reproduces this file byte-identically.
SELECT DISTINCT upper(o_orderpriority) AS fz0, o_custkey * 1 AS fz1, o_orderpriority, CASE WHEN length(o_orderstatus) < 15 THEN o_orderkey ELSE -6 END AS fz3 FROM orders WHERE (o_orderpriority NOT LIKE '%m%' OR (o_orderstatus NOT LIKE '%s%' AND o_orderstatus LIKE 'v%'))
SELECT r_regionkey - 1 AS fz0, r_regionkey * 9 AS fz1, lower(r_name) AS fz2 FROM region WHERE ((r_name NOT LIKE '%z%' OR length(r_name) <= 19) AND (r_regionkey + 5 < 1159 AND r_regionkey + 4 < 1492)) ORDER BY r_regionkey LIMIT 25
SELECT r_regionkey, count(*) AS fz_cnt, min(r_regionkey) AS fz_min, max(r_regionkey) AS fz_max FROM region WHERE r_name LIKE 'y%' GROUP BY r_regionkey
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_totalprice > 3484.13 AND o.o_orderpriority NOT LIKE '%f%'))
SELECT o_custkey, o_orderpriority, o_orderkey, o_orderstatus FROM orders WHERE (NOT (o_orderstatus NOT LIKE '%g%') OR (o_custkey IN (34, 77) OR length(o_orderstatus) > 5)) ORDER BY o_orderkey LIMIT 5
SELECT CASE WHEN r_regionkey + 8 < 1141 THEN r_regionkey ELSE 0 END AS fz0, CASE WHEN r_regionkey + 9 < 1434 THEN r_regionkey ELSE -8 END AS fz1, r_name, abs(r_regionkey - 55) AS fz3 FROM region WHERE r_regionkey IN (194, 105, 137, 95, 91) ORDER BY r_regionkey LIMIT 15
SELECT n_nationkey, length(n_name) AS fz1, r_regionkey + 9 AS fz2 FROM nation LEFT JOIN region ON n_regionkey = r_regionkey WHERE (n_nationkey + 9 < 1407 OR n_regionkey BETWEEN 474 AND 700)
SELECT o_custkey, count(*) AS fz_cnt, sum(o_orderkey) AS fz_sum FROM orders WHERE (length(o_orderstatus) < 17 AND o_totalprice >= 7003.6) GROUP BY o_custkey HAVING count(*) > 1
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT max(c_acctbal) FROM customer) * 0.5
SELECT c_name, substring(c_name, 1, 3) AS fz1 FROM customer WHERE (c_nationkey + 6 < 1849 OR c_nationkey > 1614)
SELECT r_name, n_nationkey FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
SELECT r_name, count(*) AS fz_cnt, min(r_regionkey) AS fz_min, max(r_regionkey) AS fz_max, sum(r_regionkey) AS fz_sum FROM region WHERE length(r_name) >= 9 GROUP BY r_name HAVING count(*) > 2
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT max(c_acctbal) FROM customer) * 0.25
SELECT abs(c_nationkey - 58) AS fz0, c_name, length(c_name) AS fz2 FROM customer WHERE NOT ((c_nationkey + 4 < 468 AND c_acctbal <= 2146.23))
SELECT abs(n_regionkey - 11) AS fz0, abs(c_nationkey - 32) AS fz1 FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_mktsegment NOT LIKE '%y%'
SELECT r_name, count(*) AS fz_cnt, sum(r_regionkey) AS fz_sum FROM region GROUP BY r_name
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_mktsegment NOT LIKE '%z%') INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (s_nationkey + 4 < 722)
SELECT CASE WHEN r_name NOT LIKE '%i%' THEN r_regionkey ELSE -6 END AS fz0, CASE WHEN r_name LIKE 'f%' THEN r_regionkey ELSE 0 END AS fz1, abs(r_regionkey - 79) AS fz2, CASE WHEN r_name NOT LIKE '%x%' THEN r_regionkey ELSE -2 END AS fz3 FROM region WHERE ((r_regionkey + 3 < 1780 AND r_regionkey BETWEEN 1122 AND 1188) AND (r_regionkey BETWEEN 839 AND 1051 AND r_name LIKE 'd%'))
SELECT length(c_name) AS fz0 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (length(c_mktsegment) >= 9 OR c_nationkey = 255)
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (o.o_orderpriority NOT LIKE '%f%'))
SELECT c_nationkey AS fz_k FROM customer WHERE (c_custkey IN (13, 5, 75, 123, 173) AND c_custkey BETWEEN 268 AND 661) EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_acctbal < 5964.28 AND s_nationkey + 1 < 1130)
SELECT r_name, abs(r_regionkey - 73) AS fz1, r_regionkey - 1 AS fz2, r_regionkey FROM region WHERE ((r_name NOT LIKE '%a%' OR r_regionkey <= 754) AND (r_name NOT LIKE '%w%' OR length(r_name) >= 12))
SELECT CASE WHEN s_nationkey = 465 THEN s_suppkey ELSE -5 END AS fz0, s_suppkey * 6 AS fz1, s_suppkey FROM supplier WHERE s_acctbal >= 2184.16 ORDER BY s_suppkey DESC LIMIT 42
SELECT abs(c_nationkey - 63) AS fz0, n_name FROM customer INNER JOIN nation ON c_nationkey = n_nationkey WHERE (c_nationkey BETWEEN 207 AND 246 AND c_acctbal < 1416.12)
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (o.o_totalprice > 6724.45))
SELECT n_regionkey AS fz_k FROM nation WHERE (n_nationkey >= 1205 OR n_name NOT LIKE '%u%') EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE (r_regionkey BETWEEN 690 AND 852 OR length(r_name) < 18)
SELECT c_custkey * 1 AS fz0, c_nationkey * 5 AS fz1, c_mktsegment FROM customer WHERE NOT ((c_name LIKE 'f%' OR c_acctbal > 7135.36)) ORDER BY c_custkey LIMIT 23
SELECT c_custkey, count(*) AS fz_cnt, sum(c_nationkey) AS fz_sum, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer GROUP BY c_custkey HAVING count(*) > 3
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_orderkey IN (136, 149, 126, 19, 141) AND o.o_custkey <> 1715))
SELECT abs(c_nationkey - 78) AS fz0, CASE WHEN c_nationkey + 5 < 1614 THEN c_nationkey ELSE -1 END AS fz1, CASE WHEN length(c_name) <= 14 THEN c_nationkey ELSE -2 END AS fz2, c_mktsegment FROM customer WHERE ((c_custkey IN (8, 137, 48, 173) OR length(c_name) >= 17) AND c_nationkey <> 1519) ORDER BY c_custkey LIMIT 8
SELECT c_custkey, c_name, c_mktsegment, CASE WHEN c_custkey IN (66, 49, 165, 54, 79) THEN c_custkey ELSE -8 END AS fz3 FROM customer WHERE c_mktsegment LIKE 'e%'
SELECT c_custkey, count(*) AS fz_cnt, max(c_custkey) AS fz_max, sum(c_custkey) AS fz_sum FROM customer WHERE c_acctbal >= 439.73 GROUP BY c_custkey
SELECT abs(c_nationkey - 55) AS fz0, lower(c_name) AS fz1 FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE NOT (n_regionkey + 9 < 1748))
SELECT r_regionkey - 2 AS fz0 FROM region WHERE (r_name NOT LIKE '%s%' OR length(r_name) < 14) ORDER BY r_regionkey LIMIT 18
SELECT n_nationkey - 2 AS fz0, n_name, CASE WHEN n_nationkey IN (55, 101) THEN n_regionkey ELSE 0 END AS fz2 FROM customer INNER JOIN nation ON c_nationkey = n_nationkey
SELECT p_name, count(*) AS fz_cnt, min(p_size) AS fz_min, sum(p_size) AS fz_sum FROM part WHERE (p_size BETWEEN 659 AND 853 OR p_partkey + 2 < 607) GROUP BY p_name
SELECT upper(c_mktsegment) AS fz0, lower(c_name) AS fz1, CASE WHEN c_custkey + 3 < 1782 THEN c_custkey ELSE 0 END AS fz2 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey IN (144, 120, 82, 76))
SELECT DISTINCT r_regionkey, abs(r_regionkey - 31) AS fz1 FROM region WHERE r_name LIKE 'g%'
SELECT p_type, p_size, p_type AS fzd2 FROM part WHERE p_brand LIKE 'k%'
SELECT CASE WHEN length(n_name) > 5 THEN n_nationkey ELSE -6 END AS fz0 FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
SELECT c_name, count(*) AS fz_cnt, min(c_custkey) AS fz_min, max(c_custkey) AS fz_max FROM customer WHERE (c_acctbal <= 5197.15 OR c_nationkey < 1148) GROUP BY c_name
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT max(c_acctbal) FROM customer) * 0.25
SELECT CASE WHEN p_name NOT LIKE '%c%' THEN p_partkey ELSE -6 END AS fz0, p_brand, CASE WHEN p_partkey + 2 < 247 THEN p_size ELSE -3 END AS fz2, length(p_name) AS fz3 FROM part WHERE NOT (p_size IN (38, 176))
SELECT length(n_name) AS fz0, n_name || '_x' AS fz1, abs(n_nationkey - 30) AS fz2 FROM nation INNER JOIN region ON n_regionkey = r_regionkey WHERE r_regionkey + 5 < 908
SELECT c_mktsegment, count(*) AS fz_cnt FROM customer GROUP BY c_mktsegment
SELECT n_regionkey AS fz_k FROM nation WHERE (n_name NOT LIKE '%t%' OR n_nationkey + 5 < 1237) INTERSECT SELECT r_regionkey AS fz_k FROM region WHERE NOT (length(r_name) < 15)
SELECT DISTINCT substring(s_name, 1, 2) AS fz0 FROM supplier WHERE NOT (NOT (s_nationkey >= 1273))
SELECT n_nationkey, n_nationkey + 7 AS fz1 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
SELECT s_name, count(*) AS fz_cnt, min(s_suppkey) AS fz_min FROM supplier WHERE (s_acctbal < 6263.69 OR s_acctbal <= 3503.62) GROUP BY s_name HAVING count(*) > 0
SELECT n_regionkey AS fz_k FROM nation WHERE (n_nationkey + 4 < 71 OR n_regionkey BETWEEN 1419 AND 1817) INTERSECT SELECT r_regionkey AS fz_k FROM region WHERE length(r_name) >= 8
SELECT s_acctbal, CASE WHEN s_acctbal > 7342.81 THEN s_nationkey ELSE -1 END AS fz1 FROM supplier WHERE ((s_acctbal <= 7054.52 OR s_suppkey IN (109, 106, 89, 23, 199)) AND NOT (s_suppkey IN (36, 20, 173, 80)))
SELECT c_name, n_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (c_acctbal >= 3684.19 AND c_mktsegment LIKE 'j%')
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (o.o_custkey BETWEEN 639 AND 842))
SELECT n_regionkey AS fz_k FROM nation WHERE length(n_name) > 6 EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE r_regionkey < 427
SELECT substring(o_orderstatus, 1, 4) AS fz0, abs(o_orderkey - 35) AS fz1, lower(o_orderstatus) AS fz2 FROM orders JOIN customer ON o_custkey = c_custkey
SELECT s_nationkey, count(*) AS fz_cnt, sum(s_nationkey) AS fz_sum FROM supplier GROUP BY s_nationkey
SELECT n_regionkey AS fz_k FROM nation WHERE n_regionkey BETWEEN 1424 AND 1531 UNION SELECT r_regionkey AS fz_k FROM region WHERE (r_name NOT LIKE '%a%' OR length(r_name) <= 8)
SELECT lower(r_name) AS fz0, r_name FROM region WHERE ((length(r_name) < 16 AND length(r_name) < 6) AND r_regionkey BETWEEN 1395 AND 1676) ORDER BY r_regionkey LIMIT 34
SELECT o_orderkey - 1 AS fz0, c_nationkey FROM orders LEFT JOIN customer ON o_custkey = c_custkey
SELECT r_name, count(*) AS fz_cnt, sum(r_regionkey) AS fz_sum FROM region WHERE length(r_name) >= 13 GROUP BY r_name
SELECT c_nationkey AS fz_k FROM customer WHERE c_custkey = 191 UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (s_nationkey + 2 < 1524)
SELECT abs(r_regionkey - 87) AS fz0, r_regionkey - 6 AS fz1, abs(r_regionkey - 72) AS fz2 FROM region WHERE NOT ((length(r_name) <= 13 AND r_regionkey IN (186, 162, 175, 88, 127))) ORDER BY r_regionkey LIMIT 11
SELECT c_mktsegment FROM orders LEFT JOIN customer ON o_custkey = c_custkey
SELECT CASE WHEN s_acctbal > 4592.15 THEN s_nationkey ELSE -1 END AS fz0, s_nationkey, s_nationkey + 1 AS fz2 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_regionkey IN (28, 192, 149, 5) AND n_regionkey <> 656))
SELECT c_nationkey AS fz_k FROM customer WHERE (length(c_mktsegment) < 17 OR c_nationkey + 8 < 1505) UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE s_acctbal <= 4719.94
SELECT CASE WHEN length(r_name) <= 7 THEN r_regionkey ELSE -2 END AS fz0, r_name, substring(r_name, 1, 4) AS fz2, r_name AS fzd3 FROM region WHERE r_regionkey + 8 < 645 ORDER BY r_regionkey LIMIT 9
SELECT abs(r_regionkey - 2) AS fz0 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE NOT (n_regionkey IN (113, 57, 121, 23))
SELECT CASE WHEN s_name NOT LIKE '%g%' THEN s_suppkey ELSE 0 END AS fz0, s_acctbal FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_regionkey >= 1629 AND n_name LIKE 'p%'))
SELECT c_nationkey AS fz_k FROM customer WHERE (c_custkey + 9 < 1008 AND c_mktsegment LIKE 'u%') UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE (s_nationkey + 4 < 347 OR s_acctbal >= 1723.72)
SELECT DISTINCT r_regionkey - 5 AS fz0, r_regionkey - 1 AS fz1, length(r_name) AS fz2, CASE WHEN r_regionkey IN (156, 69) THEN r_regionkey ELSE -1 END AS fz3 FROM region WHERE r_regionkey = 1795
SELECT n_regionkey, CASE WHEN c_acctbal < 6253.68 THEN c_custkey ELSE -9 END AS fz1 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
SELECT p_size, count(*) AS fz_cnt, min(p_size) AS fz_min FROM part GROUP BY p_size
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) * 0.25
SELECT abs(r_regionkey - 37) AS fz0, r_regionkey, r_regionkey AS fzd2 FROM region WHERE (r_name NOT LIKE '%f%' OR (r_regionkey BETWEEN 847 AND 879 AND length(r_name) < 13)) ORDER BY r_regionkey LIMIT 10
SELECT s_acctbal FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE s_suppkey IN (35, 47, 31, 65, 169)
SELECT r_name, count(*) AS fz_cnt, max(r_regionkey) AS fz_max FROM region GROUP BY r_name HAVING count(*) > 4
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT max(s_acctbal) FROM supplier) * 0.5
SELECT r_regionkey, substring(r_name, 1, 1) AS fz1, CASE WHEN r_regionkey > 599 THEN r_regionkey ELSE -9 END AS fz2, r_name FROM region WHERE (length(r_name) < 6 AND (r_name LIKE 't%' OR length(r_name) >= 7))
SELECT s_name, s_nationkey, CASE WHEN length(s_name) > 13 THEN s_nationkey ELSE -2 END AS fz2 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
SELECT c_custkey, count(*) AS fz_cnt, min(c_nationkey) AS fz_min, max(c_custkey) AS fz_max FROM customer GROUP BY c_custkey
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal < (SELECT min(s_acctbal) FROM supplier) * 0.25
SELECT r_regionkey, CASE WHEN r_regionkey BETWEEN 755 AND 1142 THEN r_regionkey ELSE -2 END AS fz1, r_regionkey - 4 AS fz2, CASE WHEN r_name LIKE 'n%' THEN r_regionkey ELSE -7 END AS fz3 FROM region WHERE r_regionkey + 3 < 1446
SELECT CASE WHEN length(n_name) > 4 THEN n_nationkey ELSE -8 END AS fz0, n_nationkey, s_suppkey FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
SELECT s_nationkey, count(*) AS fz_cnt, min(s_nationkey) AS fz_min, max(s_nationkey) AS fz_max, sum(s_nationkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier WHERE NOT (s_suppkey >= 247) GROUP BY s_nationkey
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal < (SELECT min(s_acctbal) FROM supplier) * 0.75
SELECT CASE WHEN r_regionkey < 1999 THEN r_regionkey ELSE -1 END AS fz0 FROM region WHERE length(r_name) > 8 ORDER BY r_regionkey LIMIT 35
SELECT r_regionkey, count(*) AS fz_cnt, min(r_regionkey) AS fz_min, sum(r_regionkey) AS fz_sum FROM region WHERE r_regionkey BETWEEN 1394 AND 1436 GROUP BY r_regionkey
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT max(s_acctbal) FROM supplier) * 0.75
SELECT s_acctbal FROM supplier WHERE (NOT (s_suppkey > 957) OR s_nationkey BETWEEN 1408 AND 1476)
SELECT abs(r_regionkey - 81) AS fz0 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE n_nationkey > 1606
SELECT n_name, count(*) AS fz_cnt, max(n_nationkey) AS fz_max, sum(n_regionkey) AS fz_sum FROM nation GROUP BY n_name HAVING count(*) > 1
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT max(s_acctbal) FROM supplier) * 0.5
SELECT CASE WHEN s_nationkey IN (11, 108, 197, 73) THEN s_suppkey ELSE -5 END AS fz0, length(s_name) AS fz1 FROM supplier WHERE NOT ((s_name NOT LIKE '%s%' AND s_nationkey >= 1421))
SELECT CASE WHEN r_regionkey >= 1 THEN r_regionkey ELSE -8 END AS fz0, abs(n_nationkey - 59) AS fz1, n_name FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (r_regionkey + 7 < 830 AND r_name LIKE 'e%')
SELECT s_nationkey, count(*) AS fz_cnt, max(s_suppkey) AS fz_max, sum(s_suppkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier GROUP BY s_nationkey
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT min(s_acctbal) FROM supplier) * 0.75
SELECT s_nationkey, CASE WHEN s_name NOT LIKE '%e%' THEN s_suppkey ELSE -5 END AS fz1, CASE WHEN s_acctbal < 7725.41 THEN s_suppkey ELSE -9 END AS fz2 FROM supplier WHERE NOT ((s_nationkey = 553 AND s_nationkey IN (196, 123)))
SELECT length(c_mktsegment) AS fz0, c_nationkey, length(n_name) AS fz2 FROM customer JOIN nation ON c_nationkey = n_nationkey
SELECT o_orderpriority, count(*) AS fz_cnt, min(o_custkey) AS fz_min, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders GROUP BY o_orderpriority
SELECT c_nationkey AS fz_k FROM customer WHERE c_acctbal > 5720.30 EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_suppkey IN (99, 8, 199) OR s_acctbal > 2232.81)
SELECT abs(n_nationkey - 91) AS fz0, n_regionkey, substring(n_name, 1, 1) AS fz2, n_regionkey - 9 AS fz3 FROM nation WHERE NOT (n_nationkey <= 507) ORDER BY n_nationkey DESC LIMIT 40
SELECT lower(n_name) AS fz0, c_nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey IN (102, 86, 95)
SELECT c_nationkey, count(*) AS fz_cnt, min(o_orderkey) AS fz_min, max(o_custkey) AS fz_max, sum(o_custkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey WHERE NOT (o_orderpriority NOT LIKE '%z%') GROUP BY c_nationkey HAVING count(*) > 0
SELECT lower(s_name) AS fz0 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_name LIKE 'q%' AND n_name NOT LIKE '%e%'))
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_acctbal >= 2445.0) INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (s_name NOT LIKE '%w%')
SELECT abs(r_regionkey - 45) AS fz0 FROM region WHERE NOT ((r_name NOT LIKE '%y%' AND r_regionkey IN (86, 137, 198)))
SELECT n_regionkey, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, max(s_suppkey) AS fz_max FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE s_name LIKE 'l%' GROUP BY n_regionkey
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_totalprice > 8769.74 AND length(o.o_orderstatus) > 16))
SELECT DISTINCT o_orderkey, o_custkey + 1 AS fz1, o_orderkey * 2 AS fz2 FROM orders WHERE length(o_orderstatus) >= 11
SELECT substring(r_name, 1, 1) AS fz0, abs(r_regionkey - 83) AS fz1 FROM region WHERE r_name LIKE 'r%' ORDER BY r_regionkey DESC LIMIT 44
SELECT s_suppkey, count(*) AS fz_cnt, sum(s_suppkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier WHERE NOT (s_name NOT LIKE '%y%') GROUP BY s_suppkey HAVING count(*) > 4
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT min(s_acctbal) FROM supplier) * 0.5
SELECT lower(s_name) AS fz0, s_suppkey + 8 AS fz1, s_nationkey - 3 AS fz2, CASE WHEN s_suppkey BETWEEN 284 AND 307 THEN s_nationkey ELSE -2 END AS fz3 FROM supplier WHERE (s_nationkey IN (138, 58, 171, 27) AND length(s_name) <= 18)
SELECT DISTINCT p_partkey + 7 AS fz0, p_partkey * 6 AS fz1, length(p_name) AS fz2 FROM part WHERE (NOT (length(p_name) >= 11) AND p_name LIKE 'e%')
SELECT r_regionkey, count(*) AS fz_cnt, sum(r_regionkey) AS fz_sum FROM region GROUP BY r_regionkey
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT min(s_acctbal) FROM supplier) * 0.5
SELECT s_acctbal, abs(s_suppkey - 77) AS fz1, s_nationkey, CASE WHEN s_acctbal < 94.5 THEN s_suppkey ELSE -5 END AS fz3 FROM supplier WHERE (NOT (s_suppkey + 1 < 596) AND s_suppkey + 4 < 342) ORDER BY s_suppkey LIMIT 27
SELECT n_name FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
SELECT s_suppkey * 9 AS fz0, s_suppkey * 1 AS fz1, s_acctbal, length(s_name) AS fz3 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (75, 73))
SELECT p_name FROM part WHERE ((p_size IN (138, 189) AND p_size + 7 < 1903) OR NOT (p_partkey IN (46, 124, 181, 56)))
SELECT n_regionkey * 3 AS fz0, n_nationkey - 4 AS fz1, CASE WHEN length(n_name) >= 14 THEN n_regionkey ELSE -7 END AS fz2, n_regionkey FROM nation WHERE (n_nationkey + 6 < 538 AND (n_regionkey = 1241 OR n_name LIKE 'z%')) ORDER BY n_nationkey LIMIT 14
SELECT c_custkey, count(*) AS fz_cnt, max(o_orderkey) AS fz_max, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_custkey
SELECT c_name, c_custkey, substring(c_mktsegment, 1, 1) AS fz2 FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE NOT (length(n_name) > 4))
SELECT DISTINCT p_retailprice, length(p_type) AS fz1 FROM part WHERE NOT (NOT (p_type NOT LIKE '%b%'))
SELECT CASE WHEN n_name LIKE 'b%' THEN n_nationkey ELSE -7 END AS fz0 FROM nation WHERE n_regionkey + 1 < 55
SELECT n_name, count(*) AS fz_cnt, min(c_custkey) AS fz_min, sum(c_custkey) AS fz_sum, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_acctbal > 1134.16 GROUP BY n_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.75
SELECT o_custkey * 7 AS fz0, o_custkey + 9 AS fz1, abs(o_custkey - 22) AS fz2 FROM orders WHERE o_custkey BETWEEN 745 AND 1075 ORDER BY o_orderkey DESC LIMIT 20
SELECT substring(r_name, 1, 1) AS fz0 FROM region WHERE NOT ((r_regionkey < 1628 OR r_regionkey + 7 < 1770)) ORDER BY r_regionkey DESC LIMIT 29
SELECT o_orderstatus, count(*) AS fz_cnt, min(o_orderkey) AS fz_min, max(o_custkey) AS fz_max, sum(o_custkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders GROUP BY o_orderstatus HAVING count(*) > 4
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT min(o_totalprice) FROM orders) * 0.25
SELECT o_totalprice, o_orderkey, abs(o_orderkey - 9) AS fz2, abs(o_orderkey - 82) AS fz3 FROM orders WHERE ((o_totalprice <= 1141.66 AND o_orderstatus LIKE 's%') OR NOT (o_orderkey + 5 < 1240))
SELECT s_name, n_regionkey, s_nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE s_nationkey BETWEEN 632 AND 734
SELECT n_name, count(*) AS fz_cnt, sum(n_regionkey) AS fz_sum FROM nation WHERE (n_regionkey BETWEEN 522 AND 676 OR n_name NOT LIKE '%y%') GROUP BY n_name HAVING count(*) > 4
SELECT o_orderkey, count(*) AS fz_cnt, min(o_custkey) AS fz_min, max(o_orderkey) AS fz_max FROM orders WHERE length(o_orderstatus) >= 14 GROUP BY o_orderkey
SELECT o_custkey AS fz_k FROM orders WHERE (o_orderkey BETWEEN 714 AND 983 AND length(o_orderpriority) < 19) EXCEPT SELECT c_custkey AS fz_k FROM customer WHERE NOT (c_acctbal <= 2731.18)
SELECT CASE WHEN n_regionkey <> 937 THEN n_nationkey ELSE -9 END AS fz0 FROM nation WHERE NOT (n_regionkey BETWEEN 608 AND 925)
SELECT n_regionkey + 4 AS fz0 FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE NOT (c_nationkey IN (27, 16, 55, 107))
SELECT n_name, count(*) AS fz_cnt, max(n_regionkey) AS fz_max FROM nation WHERE (n_nationkey BETWEEN 874 AND 1148 AND n_nationkey + 2 < 18) GROUP BY n_name
SELECT o_custkey AS fz_k FROM orders WHERE NOT (length(o_orderstatus) <= 8) UNION SELECT c_custkey AS fz_k FROM customer WHERE (c_custkey BETWEEN 593 AND 935 OR c_name LIKE 'k%')
SELECT DISTINCT n_nationkey FROM nation WHERE n_nationkey > 1703
SELECT c_name FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE NOT (n_name LIKE 'k%')
SELECT CASE WHEN s_nationkey BETWEEN 1036 AND 1076 THEN s_suppkey ELSE -4 END AS fz0, abs(s_nationkey - 96) AS fz1, s_suppkey * 2 AS fz2 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_nationkey BETWEEN 1262 AND 1540 AND n_nationkey IN (70, 198, 100, 143, 5)))
SELECT o_custkey AS fz_k FROM orders WHERE o_custkey < 1236 UNION SELECT c_custkey AS fz_k FROM customer WHERE c_name LIKE 'r%'
SELECT abs(n_regionkey - 2) AS fz0, n_name FROM nation WHERE ((n_regionkey BETWEEN 1 AND 128 OR n_name LIKE 'c%') AND length(n_name) <= 9)
SELECT abs(s_suppkey - 42) AS fz0 FROM supplier JOIN nation ON s_nationkey = n_nationkey
SELECT upper(s_name) AS fz0, s_name FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey >= 40)
SELECT o_custkey AS fz_k FROM orders WHERE (length(o_orderstatus) > 7 AND o_orderkey + 4 < 819) UNION SELECT c_custkey AS fz_k FROM customer WHERE (c_custkey IN (82, 94, 111, 39, 161) OR c_custkey BETWEEN 332 AND 432)
SELECT lower(n_name) AS fz0, n_name || '_x' AS fz1, n_regionkey * 6 AS fz2 FROM nation WHERE n_nationkey BETWEEN 936 AND 1150
SELECT CASE WHEN n_nationkey = 734 THEN n_regionkey ELSE -9 END AS fz0, s_suppkey, s_suppkey - 4 AS fz2 FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey WHERE (n_name NOT LIKE '%v%' AND n_nationkey IN (82, 31, 73, 57))
SELECT c_nationkey, count(*) AS fz_cnt, sum(c_custkey) AS fz_sum FROM customer WHERE (c_nationkey IN (129, 108, 187, 146) OR length(c_mktsegment) >= 17) GROUP BY c_nationkey HAVING count(*) > 3
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_custkey IN (126, 92) AND o.o_totalprice < 2508.64))
SELECT n_regionkey * 2 AS fz0, abs(n_nationkey - 69) AS fz1 FROM nation WHERE NOT (n_nationkey IN (53, 197, 49))
SELECT DISTINCT s_acctbal FROM supplier WHERE ((s_acctbal > 1469.63 OR s_suppkey <> 1791) AND (s_acctbal < 6665.0 AND s_acctbal >= 1658.85))
SELECT c_name, count(*) AS fz_cnt, min(c_custkey) AS fz_min, sum(c_nationkey) AS fz_sum, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer WHERE (c_name LIKE 'q%' AND length(c_mktsegment) < 4) GROUP BY c_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.25
SELECT n_nationkey, n_name, n_regionkey + 9 AS fz2 FROM nation WHERE n_nationkey + 3 < 1482
SELECT abs(s_nationkey - 45) AS fz0, s_acctbal FROM supplier WHERE (s_name NOT LIKE '%o%' OR s_acctbal > 6374.46) ORDER BY s_suppkey LIMIT 8
SELECT s_suppkey, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, sum(s_suppkey) AS fz_sum FROM supplier WHERE NOT (s_acctbal > 7884.83) GROUP BY s_suppkey
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT min(o_totalprice) FROM orders) * 0.5
SELECT DISTINCT abs(n_regionkey - 22) AS fz0, n_name || '_x' AS fz1, abs(n_regionkey - 10) AS fz2, CASE WHEN length(n_name) <= 7 THEN n_regionkey ELSE -5 END AS fz3 FROM nation WHERE NOT ((n_regionkey BETWEEN 596 AND 786 AND n_nationkey < 762))
SELECT CASE WHEN length(n_name) > 13 THEN n_regionkey ELSE -5 END AS fz0 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE NOT (s_acctbal <= 4376.45)
SELECT s_name, count(*) AS fz_cnt FROM supplier WHERE NOT (s_name NOT LIKE '%s%') GROUP BY s_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT min(o_totalprice) FROM orders) * 0.25
SELECT lower(n_name) AS fz0 FROM nation WHERE NOT (NOT (n_name NOT LIKE '%c%'))
SELECT s_suppkey + 1 AS fz0 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE s_acctbal < 5057.7
SELECT abs(n_nationkey - 3) AS fz0, abs(n_nationkey - 90) AS fz1, c_nationkey - 9 AS fz2 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (c_custkey + 3 < 1812 OR c_mktsegment LIKE 'i%')
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (o.o_orderkey < 1658))
SELECT n_regionkey AS fz_k FROM nation WHERE n_nationkey BETWEEN 853 AND 1214 EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE r_regionkey <> 606
SELECT o_orderstatus || '_x' AS fz0, o_orderstatus FROM orders WHERE (NOT (o_orderstatus LIKE 'g%') AND NOT (o_custkey + 4 < 673))
SELECT length(n_name) AS fz0, length(s_name) AS fz1 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE (s_acctbal >= 1044.5 OR s_nationkey BETWEEN 458 AND 641)
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (length(o.o_orderstatus) >= 9 OR o.o_orderkey + 5 < 1920))
SELECT n_regionkey AS fz_k FROM nation WHERE NOT (n_nationkey + 2 < 1269) EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE (length(r_name) <= 14 AND length(r_name) > 8)
SELECT s_name, abs(s_suppkey - 29) AS fz1, abs(s_suppkey - 77) AS fz2 FROM supplier WHERE NOT ((s_acctbal < 3689.84 AND s_nationkey + 9 < 630)) ORDER BY s_suppkey DESC LIMIT 17
SELECT s_nationkey + 5 AS fz0 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE NOT (s_name NOT LIKE '%v%')
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_orderkey BETWEEN 470 AND 863 AND o.o_orderstatus LIKE 'w%'))
SELECT c_nationkey AS fz_k FROM customer WHERE (length(c_mktsegment) > 15 OR length(c_name) > 8) UNION SELECT s_nationkey AS fz_k FROM supplier WHERE (s_suppkey + 6 < 1754 OR length(s_name) >= 9)
SELECT CASE WHEN s_name LIKE 'h%' THEN s_suppkey ELSE -2 END AS fz0, CASE WHEN s_suppkey + 6 < 266 THEN s_nationkey ELSE -9 END AS fz1, s_name || '_x' AS fz2, CASE WHEN s_acctbal > 2361.96 THEN s_suppkey ELSE 0 END AS fz3 FROM supplier WHERE s_nationkey <= 146
SELECT r_regionkey, count(*) AS fz_cnt, min(r_regionkey) AS fz_min, max(r_regionkey) AS fz_max, sum(r_regionkey) AS fz_sum FROM region GROUP BY r_regionkey
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 6440.54)
SELECT DISTINCT abs(n_nationkey - 63) AS fz0 FROM nation WHERE (NOT (length(n_name) > 8) AND (n_regionkey BETWEEN 522 AND 672 OR n_nationkey <> 1427))
SELECT s_nationkey * 3 AS fz0, s_suppkey * 8 AS fz1, s_nationkey - 1 AS fz2, s_suppkey FROM supplier WHERE s_nationkey >= 1167 ORDER BY s_suppkey LIMIT 5
SELECT c_mktsegment, abs(c_nationkey - 4) AS fz1, c_acctbal FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE (n_nationkey IN (36, 98) OR n_regionkey + 2 < 1957))
SELECT c_nationkey AS fz_k FROM customer WHERE (c_custkey IN (64, 171, 104) AND c_mktsegment LIKE 'b%') INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (s_name LIKE 'l%')
SELECT CASE WHEN n_nationkey BETWEEN 282 AND 615 THEN n_regionkey ELSE -1 END AS fz0 FROM nation WHERE NOT ((n_nationkey IN (167, 173) AND n_nationkey IN (6, 126)))
SELECT CASE WHEN n_nationkey BETWEEN 592 AND 777 THEN n_nationkey ELSE -5 END AS fz0 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (r_regionkey IN (123, 42) OR length(r_name) < 6)
SELECT lower(s_name) AS fz0 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_regionkey BETWEEN 701 AND 978 AND n_regionkey BETWEEN 685 AND 955))
SELECT o_custkey AS fz_k FROM orders WHERE NOT (o_orderstatus LIKE 'y%') INTERSECT SELECT c_custkey AS fz_k FROM customer WHERE c_mktsegment LIKE 'x%'
SELECT r_regionkey * 7 AS fz0 FROM region WHERE NOT (NOT (length(r_name) < 6))
SELECT upper(r_name) AS fz0 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE length(r_name) >= 11
SELECT s_suppkey, s_suppkey AS fzd1, abs(s_suppkey - 23) AS fz2, s_suppkey AS fzd3 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_regionkey IN (52, 121, 118) OR n_nationkey IN (23, 97, 9)))
SELECT o_custkey, abs(o_custkey - 98) AS fz1, abs(o_custkey - 79) AS fz2, lower(o_orderpriority) AS fz3 FROM orders WHERE NOT (NOT (o_orderstatus LIKE 's%'))
SELECT DISTINCT r_regionkey, r_regionkey AS fzd1 FROM region WHERE (NOT (r_regionkey BETWEEN 494 AND 508) OR r_regionkey = 1354)
SELECT n_nationkey, n_name, CASE WHEN r_name LIKE 'b%' THEN r_regionkey ELSE -6 END AS fz2 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE NOT (n_name NOT LIKE '%j%')
SELECT abs(s_suppkey - 67) AS fz0, s_nationkey FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey + 3 < 1586)
SELECT abs(o_orderkey - 78) AS fz0 FROM orders WHERE NOT ((o_orderpriority LIKE 't%' OR o_orderpriority LIKE 's%'))
SELECT o_orderpriority || '_x' AS fz0, CASE WHEN o_orderkey IN (146, 90, 161, 69, 71) THEN o_custkey ELSE -1 END AS fz1, abs(o_custkey - 11) AS fz2 FROM orders WHERE ((o_custkey + 8 < 102 AND o_orderstatus LIKE 'j%') OR o_custkey + 3 < 1390)
SELECT n_regionkey, count(*) AS fz_cnt, min(c_nationkey) AS fz_min, max(c_nationkey) AS fz_max FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_regionkey
SELECT n_name, count(*) AS fz_cnt FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
SELECT n_name FROM nation WHERE ((n_nationkey + 1 < 1056 OR n_nationkey IN (113, 82, 111)) AND (n_nationkey IN (54, 39, 131, 144, 24) AND length(n_name) >= 14))
SELECT o_orderpriority FROM orders LEFT JOIN customer ON o_custkey = c_custkey
SELECT n_name, count(*) AS fz_cnt, min(c_nationkey) AS fz_min, max(c_custkey) AS fz_max, sum(c_nationkey) AS fz_sum, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE (c_mktsegment NOT LIKE '%u%' AND length(c_name) >= 18) GROUP BY n_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
SELECT CASE WHEN n_regionkey + 7 < 1807 THEN n_regionkey ELSE 0 END AS fz0, n_nationkey + 7 AS fz1 FROM nation WHERE n_regionkey IN (139, 193)
SELECT c_name, upper(o_orderpriority) AS fz1, c_custkey FROM orders JOIN customer ON o_custkey = c_custkey WHERE c_acctbal < 6208.26
SELECT r_name, count(*) AS fz_cnt, min(n_regionkey) AS fz_min, max(n_regionkey) AS fz_max FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name HAVING count(*) > 0
SELECT c_nationkey AS fz_k FROM customer WHERE length(c_name) < 4 UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE (s_suppkey IN (100, 28, 55, 77) OR s_name NOT LIKE '%t%')
SELECT substring(n_name, 1, 3) AS fz0, n_nationkey, n_regionkey * 1 AS fz2 FROM nation WHERE (NOT (n_nationkey + 8 < 1402) AND NOT (n_regionkey >= 1366))
SELECT CASE WHEN length(c_name) <= 10 THEN c_nationkey ELSE 0 END AS fz0, c_custkey FROM orders LEFT JOIN customer ON o_custkey = c_custkey WHERE (o_orderkey <> 1158 AND o_orderpriority NOT LIKE '%s%')
SELECT n_nationkey, count(*) AS fz_cnt, max(s_nationkey) AS fz_max, sum(s_nationkey) AS fz_sum FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE NOT (s_name LIKE 'g%') GROUP BY n_nationkey
SELECT c_nationkey AS fz_k FROM customer WHERE (c_acctbal <= 6436.73 OR c_custkey + 2 < 1763) INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE (s_nationkey IN (12, 152, 107) AND s_suppkey + 8 < 304)
SELECT abs(n_nationkey - 71) AS fz0, abs(n_nationkey - 70) AS fz1, n_name, n_nationkey FROM nation WHERE (NOT (n_name LIKE 'q%') AND n_nationkey > 1433)
SELECT lower(o_orderpriority) AS fz0, c_custkey - 6 AS fz1 FROM orders JOIN customer ON o_custkey = c_custkey WHERE NOT (c_nationkey <= 441)
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT min(o_totalprice) FROM orders) * 0.75
SELECT abs(c_nationkey - 76) AS fz0 FROM customer WHERE c_nationkey BETWEEN 1463 AND 1481 ORDER BY c_custkey LIMIT 27
SELECT c_mktsegment, n_regionkey FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE NOT (n_nationkey >= 1389)
SELECT n_regionkey, count(*) AS fz_cnt, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_regionkey
SELECT o_custkey AS fz_k FROM orders WHERE (o_custkey >= 1133 OR o_orderkey + 9 < 762) UNION SELECT c_custkey AS fz_k FROM customer WHERE NOT (c_acctbal < 2915.17)
SELECT CASE WHEN c_acctbal >= 7636.93 THEN c_custkey ELSE -8 END AS fz0, CASE WHEN c_custkey <= 1127 THEN c_custkey ELSE -4 END AS fz1 FROM customer WHERE ((c_mktsegment LIKE 'j%' OR c_nationkey + 1 < 1248) OR (length(c_name) > 15 AND c_mktsegment LIKE 'u%'))
SELECT abs(c_nationkey - 48) AS fz0 FROM customer INNER JOIN nation ON c_nationkey = n_nationkey
SELECT n_nationkey, count(*) AS fz_cnt, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_nationkey <> 699 GROUP BY n_nationkey
SELECT o_custkey AS fz_k FROM orders WHERE (o_orderpriority NOT LIKE '%b%' AND o_custkey + 7 < 1434) UNION SELECT c_custkey AS fz_k FROM customer WHERE c_acctbal >= 4593.25
SELECT c_custkey + 1 AS fz0, c_mktsegment FROM customer WHERE (length(c_name) < 11 AND (c_custkey + 4 < 497 AND c_nationkey IN (170, 95)))
SELECT CASE WHEN n_regionkey BETWEEN 1004 AND 1321 THEN n_nationkey ELSE -5 END AS fz0, CASE WHEN s_name LIKE 'q%' THEN s_nationkey ELSE -8 END AS fz1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
SELECT r_regionkey, count(*) AS fz_cnt, min(n_nationkey) AS fz_min, sum(n_regionkey) AS fz_sum FROM nation JOIN region ON n_regionkey = r_regionkey WHERE NOT (n_regionkey BETWEEN 816 AND 947) GROUP BY r_regionkey HAVING count(*) > 1
SELECT o_custkey AS fz_k FROM orders WHERE (o_totalprice > 4960.67 OR length(o_orderstatus) >= 4) UNION SELECT c_custkey AS fz_k FROM customer WHERE (c_nationkey IN (160, 69) OR length(c_name) > 16)
SELECT DISTINCT abs(c_custkey - 87) AS fz0, substring(c_mktsegment, 1, 3) AS fz1, c_custkey FROM customer WHERE NOT (NOT (length(c_name) <= 8))
SELECT n_regionkey - 6 AS fz0 FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey WHERE n_regionkey + 8 < 1590
SELECT n_nationkey, count(*) AS fz_cnt, max(s_nationkey) AS fz_max FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_nationkey
SELECT abs(s_nationkey - 20) AS fz0 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey >= 718)
SELECT o_custkey FROM orders WHERE o_totalprice <= 2110.10
SELECT o_custkey + 8 AS fz0, o_custkey, substring(o_orderpriority, 1, 1) AS fz2, CASE WHEN o_totalprice <= 2729.52 THEN o_orderkey ELSE -9 END AS fz3 FROM orders WHERE ((length(o_orderstatus) > 6 OR o_orderkey BETWEEN 229 AND 463) AND o_orderpriority LIKE 'h%')
SELECT c_custkey, count(*) AS fz_cnt, max(o_custkey) AS fz_max, sum(o_custkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey WHERE (o_totalprice > 7008.4 AND o_totalprice >= 5936.84) GROUP BY c_custkey HAVING count(*) > 1
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.75
SELECT o_totalprice, o_totalprice AS fzd1 FROM orders WHERE ((o_orderpriority NOT LIKE '%c%' AND o_custkey >= 1140) AND (o_custkey >= 1885 OR o_orderpriority LIKE 'r%'))
SELECT CASE WHEN n_name NOT LIKE '%w%' THEN n_regionkey ELSE -9 END AS fz0 FROM nation JOIN region ON n_regionkey = r_regionkey
SELECT n_name, count(*) AS fz_cnt, sum(s_suppkey) AS fz_sum FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.75
SELECT DISTINCT CASE WHEN c_mktsegment LIKE 'i%' THEN c_nationkey ELSE -6 END AS fz0, CASE WHEN c_mktsegment LIKE 'j%' THEN c_custkey ELSE -7 END AS fz1, c_custkey + 2 AS fz2 FROM customer WHERE ((length(c_mktsegment) > 15 AND c_name NOT LIKE '%s%') AND (length(c_name) > 4 OR length(c_name) <= 18))
SELECT lower(n_name) AS fz0 FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE NOT (length(c_mktsegment) >= 13)
SELECT n_name, count(*) AS fz_cnt, min(c_custkey) AS fz_min, max(c_custkey) AS fz_max, sum(c_custkey) AS fz_sum FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name HAVING count(*) > 3
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT min(o_totalprice) FROM orders) * 0.25
SELECT c_acctbal, CASE WHEN c_nationkey + 4 < 701 THEN c_custkey ELSE -8 END AS fz1, abs(c_custkey - 63) AS fz2, c_mktsegment FROM customer WHERE NOT (c_mktsegment NOT LIKE '%p%')
SELECT n_nationkey, upper(c_mktsegment) AS fz1, c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
SELECT r_name, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name HAVING count(*) > 1
SELECT DISTINCT p_partkey - 7 AS fz0, p_retailprice, length(p_type) AS fz2, CASE WHEN length(p_type) <= 17 THEN p_size ELSE -4 END AS fz3 FROM part WHERE ((p_retailprice >= 5976.51 OR p_retailprice >= 8054.49) AND NOT (p_type NOT LIKE '%m%'))
SELECT length(o_orderpriority) AS fz0, abs(c_custkey - 12) AS fz1, CASE WHEN o_orderstatus NOT LIKE '%r%' THEN o_custkey ELSE -9 END AS fz2 FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE (length(c_name) <= 9 AND c_custkey <> 460)
SELECT o_orderpriority, count(*) AS fz_cnt, min(o_custkey) AS fz_min FROM orders WHERE NOT (o_orderkey + 3 < 360) GROUP BY o_orderpriority
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT min(c_acctbal) FROM customer) * 0.75
SELECT DISTINCT p_size FROM part WHERE ((p_partkey >= 1358 AND p_partkey + 6 < 1484) OR p_brand LIKE 'q%')
SELECT o_custkey + 7 AS fz0, o_totalprice FROM orders INNER JOIN customer ON o_custkey = c_custkey
SELECT o_orderpriority, count(*) AS fz_cnt, max(o_custkey) AS fz_max, sum(o_custkey) AS fz_sum FROM orders WHERE NOT (o_totalprice <= 1745.7) GROUP BY o_orderpriority
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT min(c_acctbal) FROM customer) * 0.25
SELECT abs(p_partkey - 32) AS fz0, p_size * 6 AS fz1 FROM part WHERE ((p_name NOT LIKE '%x%' AND p_type NOT LIKE '%x%') OR p_brand NOT LIKE '%w%') ORDER BY p_partkey DESC LIMIT 16
SELECT c_custkey, c_mktsegment || '_x' AS fz1 FROM orders INNER JOIN customer ON o_custkey = c_custkey
SELECT p_name, count(*) AS fz_cnt, max(p_size) AS fz_max, sum(p_partkey) AS fz_sum, sum(CAST(p_retailprice AS DECIMAL(18,2))) AS fz_dsum FROM part WHERE p_retailprice < 6778.60 GROUP BY p_name
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT max(c_acctbal) FROM customer) * 0.25
SELECT substring(p_name, 1, 3) AS fz0, p_partkey, p_retailprice FROM part WHERE p_type LIKE 'n%' ORDER BY p_partkey LIMIT 15
SELECT abs(r_regionkey - 87) AS fz0 FROM nation INNER JOIN region ON n_regionkey = r_regionkey WHERE NOT (r_regionkey >= 1570)
SELECT n_nationkey, count(*) AS fz_cnt, min(n_nationkey) AS fz_min, max(n_regionkey) AS fz_max, sum(n_regionkey) AS fz_sum FROM nation GROUP BY n_nationkey
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT max(c_acctbal) FROM customer) * 0.5
SELECT o_custkey AS fz_k FROM orders WHERE (o_orderpriority NOT LIKE '%p%' AND o_orderkey BETWEEN 1430 AND 1630) UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE (c_mktsegment NOT LIKE '%d%' OR c_name LIKE 'c%')
SELECT DISTINCT substring(c_name, 1, 2) AS fz0, c_custkey * 2 AS fz1, abs(c_nationkey - 56) AS fz2, substring(c_name, 1, 2) AS fz3 FROM customer WHERE c_acctbal > 4493.94
SELECT s_name, abs(s_nationkey - 46) AS fz1, n_nationkey * 2 AS fz2 FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey WHERE (n_nationkey BETWEEN 746 AND 1129 OR n_nationkey BETWEEN 790 AND 1190)
SELECT c_name, CASE WHEN c_custkey IN (38, 3, 154) THEN c_nationkey ELSE -3 END AS fz1 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE NOT (n_regionkey + 6 < 662))
SELECT n_regionkey AS fz_k FROM nation WHERE n_name LIKE 'p%' UNION ALL SELECT r_regionkey AS fz_k FROM region WHERE (r_regionkey + 8 < 1428 AND r_regionkey > 1276)
SELECT n_nationkey + 3 AS fz0 FROM nation WHERE ((n_nationkey + 2 < 903 AND n_name LIKE 'a%') OR (n_nationkey <> 345 AND n_regionkey IN (111, 173, 54, 150, 142)))
SELECT c_mktsegment, CASE WHEN o_orderstatus NOT LIKE '%u%' THEN o_orderkey ELSE -8 END AS fz1 FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE (o_orderpriority LIKE 'k%' OR o_orderkey + 6 < 1046)
SELECT abs(c_nationkey - 40) AS fz0, abs(c_custkey - 76) AS fz1 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE (n_name LIKE 'v%' AND n_nationkey <> 1447))
SELECT p_type, CASE WHEN length(p_type) <= 11 THEN p_partkey ELSE -7 END AS fz1 FROM part WHERE ((length(p_name) < 13 AND p_partkey + 3 < 410) AND p_retailprice > 4595.60) ORDER BY p_partkey DESC LIMIT 28
SELECT CASE WHEN n_regionkey BETWEEN 912 AND 918 THEN n_regionkey ELSE -8 END AS fz0, length(n_name) AS fz1 FROM nation WHERE n_regionkey IN (172, 142, 196, 137, 160)
SELECT n_nationkey, count(*) AS fz_cnt, max(s_suppkey) AS fz_max FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE NOT (s_acctbal < 2941.93) GROUP BY n_nationkey
SELECT CASE WHEN c_name NOT LIKE '%v%' THEN c_nationkey ELSE -7 END AS fz0, c_nationkey, c_nationkey AS fzd2 FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_regionkey + 8 < 34 AND n_regionkey + 7 < 455))
SELECT abs(p_partkey - 22) AS fz0, abs(p_partkey - 63) AS fz1, abs(p_size - 38) AS fz2 FROM part WHERE (NOT (p_brand NOT LIKE '%t%') OR NOT (length(p_brand) < 14))
SELECT lower(n_name) AS fz0, CASE WHEN n_regionkey + 7 < 781 THEN n_nationkey ELSE -4 END AS fz1 FROM nation WHERE n_nationkey <= 1600
SELECT n_nationkey, count(*) AS fz_cnt, min(c_nationkey) AS fz_min, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE (length(c_mktsegment) >= 12 OR c_custkey + 8 < 40) GROUP BY n_nationkey
SELECT c_nationkey, c_mktsegment, c_custkey, c_name || '_x' AS fz3 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE (n_regionkey BETWEEN 1290 AND 1553 AND length(n_name) < 14))
SELECT n_regionkey AS fz_k FROM nation WHERE NOT (n_nationkey IN (191, 193, 184, 109)) EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE (r_name NOT LIKE '%i%' AND r_regionkey IN (173, 109, 91))
SELECT abs(r_regionkey - 72) AS fz0, r_regionkey FROM region WHERE (NOT (r_regionkey + 4 < 611) OR length(r_name) <= 18)
SELECT abs(n_nationkey - 78) AS fz0, c_name, n_regionkey FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
SELECT s_name, count(*) AS fz_cnt, min(s_nationkey) AS fz_min, max(s_suppkey) AS fz_max, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier WHERE NOT (s_suppkey + 3 < 1503) GROUP BY s_name
SELECT c_nationkey AS fz_k FROM customer WHERE c_nationkey BETWEEN 1449 AND 1655 EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (s_acctbal >= 3459.1)
SELECT DISTINCT r_regionkey, r_regionkey AS fzd1 FROM region WHERE (length(r_name) < 15 AND r_regionkey + 2 < 677)
SELECT CASE WHEN n_regionkey IN (180, 167, 100) THEN n_regionkey ELSE -2 END AS fz0, CASE WHEN c_nationkey >= 70 THEN c_nationkey ELSE 0 END AS fz1, abs(n_nationkey - 45) AS fz2 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (o.o_totalprice >= 4560.22))
SELECT n_regionkey AS fz_k FROM nation WHERE NOT (n_regionkey + 3 < 1325) EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE (r_regionkey BETWEEN 1398 AND 1476 OR r_regionkey BETWEEN 493 AND 595)
SELECT r_name, r_regionkey, r_name AS fzd2 FROM region WHERE r_regionkey <> 1743 ORDER BY r_regionkey DESC LIMIT 16
SELECT c_custkey * 9 AS fz0, n_regionkey - 6 AS fz1, c_custkey + 3 AS fz2 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey WHERE (c_nationkey BETWEEN 1308 AND 1585 AND length(c_mktsegment) <= 18)
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_orderkey > 65 AND o.o_custkey IN (142, 150, 10, 58)))
SELECT abs(o_orderkey - 88) AS fz0 FROM orders WHERE ((length(o_orderpriority) > 10 AND o_orderpriority LIKE 'a%') OR NOT (o_custkey IN (117, 159, 178, 189))) ORDER BY o_orderkey LIMIT 8
SELECT DISTINCT CASE WHEN r_name LIKE 'c%' THEN r_regionkey ELSE -3 END AS fz0, r_name, r_regionkey * 2 AS fz2, abs(r_regionkey - 78) AS fz3 FROM region WHERE ((r_name LIKE 'z%' OR r_regionkey + 7 < 1042) OR (length(r_name) <= 14 OR r_name LIKE 'r%'))
SELECT n_regionkey, s_name || '_x' AS fz1 FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE n_nationkey BETWEEN 538 AND 608
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (o.o_totalprice < 1729.56))
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT max(s_acctbal) FROM supplier) * 0.5
SELECT s_nationkey, s_nationkey AS fzd1 FROM supplier WHERE s_acctbal >= 127.57
SELECT c_custkey * 9 AS fz0, o_orderstatus || '_x' AS fz1, o_custkey FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE NOT (o_orderstatus NOT LIKE '%k%')
SELECT p_type, count(*) AS fz_cnt, min(p_partkey) AS fz_min FROM part GROUP BY p_type
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) * 0.25
SELECT lower(c_name) AS fz0, abs(c_custkey - 84) AS fz1, c_nationkey FROM customer WHERE NOT (NOT (c_custkey IN (60, 159, 135, 177, 0)))
SELECT r_name, n_name FROM nation LEFT JOIN region ON n_regionkey = r_regionkey WHERE n_name NOT LIKE '%d%'
SELECT p_name, count(*) AS fz_cnt, min(p_size) AS fz_min, sum(p_size) AS fz_sum, sum(CAST(p_retailprice AS DECIMAL(18,2))) AS fz_dsum FROM part WHERE p_size BETWEEN 494 AND 888 GROUP BY p_name
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT min(c_acctbal) FROM customer) * 0.5
SELECT c_custkey - 1 AS fz0, c_custkey + 2 AS fz1, abs(c_nationkey - 29) AS fz2, c_custkey * 4 AS fz3 FROM customer WHERE NOT ((c_mktsegment LIKE 'a%' OR c_nationkey IN (152, 1, 23))) ORDER BY c_custkey DESC LIMIT 8
SELECT n_regionkey, abs(r_regionkey - 76) AS fz1 FROM nation INNER JOIN region ON n_regionkey = r_regionkey WHERE (n_nationkey >= 408 AND n_name NOT LIKE '%r%')
SELECT c_mktsegment, count(*) AS fz_cnt, max(c_nationkey) AS fz_max, sum(c_custkey) AS fz_sum FROM customer GROUP BY c_mktsegment HAVING count(*) > 0
SELECT n_regionkey AS fz_k FROM nation WHERE (n_name LIKE 's%' OR n_name NOT LIKE '%q%') EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE (r_regionkey = 1069 AND r_name NOT LIKE '%t%')
SELECT r_regionkey FROM region WHERE r_name NOT LIKE '%i%'
SELECT CASE WHEN n_nationkey BETWEEN 928 AND 1115 THEN n_regionkey ELSE -5 END AS fz0 FROM nation LEFT JOIN region ON n_regionkey = r_regionkey WHERE (n_nationkey BETWEEN 1052 AND 1214 AND n_name NOT LIKE '%e%')
SELECT c_mktsegment, count(*) AS fz_cnt, max(c_nationkey) AS fz_max, sum(c_nationkey) AS fz_sum, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer GROUP BY c_mktsegment
SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey IN (196, 112, 114)
SELECT n_nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE (s_suppkey + 5 < 535 AND s_nationkey IN (194, 184))
SELECT r_regionkey, count(*) AS fz_cnt FROM region GROUP BY r_regionkey
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT min(o_totalprice) FROM orders) * 0.5
SELECT s_acctbal, s_suppkey FROM supplier WHERE (NOT (s_acctbal < 3991.43) AND NOT (s_nationkey IN (93, 20)))
SELECT abs(c_nationkey - 32) AS fz0 FROM orders LEFT JOIN customer ON o_custkey = c_custkey WHERE (o_orderkey IN (32, 57) OR o_custkey BETWEEN 1347 AND 1553)
SELECT r_regionkey, count(*) AS fz_cnt, min(r_regionkey) AS fz_min, sum(r_regionkey) AS fz_sum FROM region GROUP BY r_regionkey
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
SELECT s_suppkey + 8 AS fz0, abs(s_nationkey - 73) AS fz1, s_nationkey * 7 AS fz2 FROM supplier WHERE s_acctbal >= 3071.59 ORDER BY s_suppkey LIMIT 43
SELECT substring(o_orderpriority, 1, 3) AS fz0, CASE WHEN o_orderkey IN (124, 189, 0, 148, 27) THEN o_orderkey ELSE 0 END AS fz1, abs(o_custkey - 53) AS fz2 FROM orders JOIN customer ON o_custkey = c_custkey
SELECT s_name, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier GROUP BY s_name HAVING count(*) > 3
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT max(s_acctbal) FROM supplier) * 0.75
SELECT s_nationkey, CASE WHEN s_nationkey >= 487 THEN s_nationkey ELSE -2 END AS fz1, upper(s_name) AS fz2 FROM supplier WHERE NOT (NOT (s_name NOT LIKE '%t%'))
SELECT o_custkey + 5 AS fz0, c_custkey FROM orders JOIN customer ON o_custkey = c_custkey WHERE (c_custkey + 2 < 1848 AND c_acctbal < 8203.3)
SELECT s_name, count(*) AS fz_cnt, max(s_suppkey) AS fz_max FROM supplier WHERE s_suppkey IN (27, 108) GROUP BY s_name
SELECT c_nationkey AS fz_k FROM customer WHERE c_name NOT LIKE '%t%' UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE s_acctbal <= 7995.59
SELECT lower(o_orderstatus) AS fz0, length(o_orderstatus) AS fz1 FROM orders WHERE o_orderkey <= 1588
SELECT r_name FROM region WHERE (r_regionkey BETWEEN 1030 AND 1322 AND (r_regionkey <> 1899 OR length(r_name) >= 14))
SELECT c_custkey, count(*) AS fz_cnt, max(c_nationkey) AS fz_max, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer GROUP BY c_custkey HAVING count(*) > 3
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_orderkey BETWEEN 314 AND 315 AND o.o_orderkey > 1851))
SELECT o_custkey - 3 AS fz0, o_custkey, CASE WHEN o_totalprice > 8642.76 THEN o_orderkey ELSE -3 END AS fz2 FROM orders WHERE o_orderkey IN (17, 180)
SELECT CASE WHEN n_regionkey + 6 < 399 THEN n_nationkey ELSE -2 END AS fz0, c_nationkey, c_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
SELECT s_nationkey, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, max(s_suppkey) AS fz_max FROM supplier WHERE (s_suppkey < 24 OR s_nationkey >= 577) GROUP BY s_nationkey
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_custkey = 899)
SELECT o_orderpriority, substring(o_orderpriority, 1, 5) AS fz1, o_totalprice FROM orders WHERE (NOT (o_custkey IN (97, 18, 98)) AND NOT (o_custkey > 1979))
SELECT length(s_name) AS fz0, CASE WHEN length(s_name) > 17 THEN s_suppkey ELSE -4 END AS fz1 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE s_nationkey > 94
SELECT s_name, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, max(s_suppkey) AS fz_max, sum(s_suppkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier GROUP BY s_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.5
SELECT lower(o_orderpriority) AS fz0, length(o_orderpriority) AS fz1, length(o_orderpriority) AS fz2, o_orderpriority FROM orders WHERE NOT ((o_custkey BETWEEN 1165 AND 1214 OR o_totalprice >= 2652.35)) ORDER BY o_orderkey DESC LIMIT 43
SELECT s_nationkey FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE s_nationkey IN (125, 79, 38)
SELECT p_brand, count(*) AS fz_cnt, sum(p_size) AS fz_sum FROM part GROUP BY p_brand HAVING count(*) > 0
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT min(o_totalprice) FROM orders) * 0.25
SELECT n_name || '_x' AS fz0, n_nationkey, n_name, abs(n_regionkey - 5) AS fz3 FROM nation WHERE ((n_name LIKE 'g%' OR n_regionkey + 5 < 1783) OR NOT (n_nationkey < 47))
SELECT n_regionkey, count(*) AS fz_cnt, max(c_custkey) AS fz_max, sum(c_nationkey) AS fz_sum FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_regionkey
SELECT s_acctbal, CASE WHEN s_suppkey = 1965 THEN s_nationkey ELSE -4 END AS fz1, CASE WHEN s_nationkey <> 378 THEN s_suppkey ELSE -8 END AS fz2, CASE WHEN s_nationkey IN (6, 69, 138) THEN s_suppkey ELSE -8 END AS fz3 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 714)
SELECT CASE WHEN n_nationkey + 5 < 6 THEN n_nationkey ELSE -6 END AS fz0, n_name || '_x' AS fz1, length(n_name) AS fz2, abs(n_nationkey - 70) AS fz3 FROM nation WHERE (NOT (n_nationkey > 470) OR NOT (length(n_name) < 10))
SELECT substring(r_name, 1, 3) AS fz0 FROM nation LEFT JOIN region ON n_regionkey = r_regionkey WHERE n_nationkey BETWEEN 978 AND 1294
SELECT r_regionkey, count(*) AS fz_cnt, min(n_regionkey) AS fz_min, max(n_regionkey) AS fz_max FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (length(n_name) > 13 OR n_regionkey BETWEEN 824 AND 833) GROUP BY r_regionkey
SELECT s_name, substring(s_name, 1, 1) AS fz1, CASE WHEN s_nationkey IN (66, 86, 67, 12, 100) THEN s_suppkey ELSE -5 END AS fz2 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE NOT (n_regionkey BETWEEN 256 AND 638))
SELECT upper(n_name) AS fz0 FROM nation WHERE length(n_name) >= 13 ORDER BY n_nationkey DESC LIMIT 22
SELECT r_regionkey * 6 AS fz0 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE NOT (r_regionkey + 5 < 551)
SELECT c_nationkey, count(*) AS fz_cnt, min(o_orderkey) AS fz_min, max(o_orderkey) AS fz_max, sum(o_orderkey) AS fz_sum FROM orders JOIN customer ON o_custkey = c_custkey WHERE (o_orderkey > 1503 OR o_orderkey = 1575) GROUP BY c_nationkey HAVING count(*) > 2
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.75
SELECT DISTINCT n_regionkey, n_nationkey + 5 AS fz1 FROM nation WHERE (n_nationkey IN (153, 40, 86) OR n_regionkey + 9 < 1271)
SELECT c_acctbal FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE (length(n_name) <= 5 OR n_nationkey >= 379)
SELECT n_name, count(*) AS fz_cnt, sum(s_suppkey) AS fz_sum FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.5
SELECT CASE WHEN p_size BETWEEN 1142 AND 1275 THEN p_partkey ELSE -7 END AS fz0, p_name, CASE WHEN p_partkey IN (193, 107, 41, 5, 65) THEN p_partkey ELSE -8 END AS fz2 FROM part WHERE (p_partkey <= 1020 AND (p_partkey + 2 < 1658 AND p_name NOT LIKE '%z%'))
SELECT abs(s_suppkey - 68) AS fz0, abs(s_nationkey - 12) AS fz1, s_suppkey * 1 AS fz2, CASE WHEN s_suppkey <= 1914 THEN s_suppkey ELSE -2 END AS fz3 FROM supplier WHERE s_nationkey = 713
SELECT r_name, r_name || '_x' AS fz1 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE NOT (n_name NOT LIKE '%c%')
SELECT o_orderpriority, count(*) AS fz_cnt, min(o_custkey) AS fz_min, max(o_orderkey) AS fz_max, sum(o_orderkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders GROUP BY o_orderpriority
SELECT c_nationkey AS fz_k FROM customer WHERE c_acctbal <= 7825.96 UNION ALL SELECT s_nationkey AS fz_k FROM supplier WHERE (s_acctbal <= 1185.28 OR length(s_name) > 6)
SELECT DISTINCT CASE WHEN s_suppkey BETWEEN 126 AND 515 THEN s_nationkey ELSE -4 END AS fz0 FROM supplier WHERE s_name NOT LIKE '%r%'
SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey WHERE n_regionkey IN (55, 174, 172, 109, 51)
SELECT abs(s_nationkey - 16) AS fz0, s_acctbal, s_name || '_x' AS fz2, CASE WHEN s_name LIKE 'p%' THEN s_suppkey ELSE 0 END AS fz3 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name NOT LIKE '%c%')
SELECT o_custkey AS fz_k FROM orders WHERE NOT (o_totalprice > 281.28) INTERSECT SELECT c_custkey AS fz_k FROM customer WHERE NOT (c_mktsegment LIKE 't%')
SELECT DISTINCT s_suppkey, s_name FROM supplier WHERE s_acctbal <= 8150.90
SELECT n_regionkey FROM nation INNER JOIN region ON n_regionkey = r_regionkey
SELECT CASE WHEN s_suppkey IN (169, 60, 19, 147, 159) THEN s_suppkey ELSE -4 END AS fz0, s_nationkey * 6 AS fz1, s_suppkey FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_regionkey + 5 < 203 OR n_regionkey BETWEEN 1162 AND 1367))
SELECT c_nationkey AS fz_k FROM customer WHERE (c_custkey IN (72, 113, 87) AND c_mktsegment LIKE 'z%') INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE s_suppkey IN (1, 152, 44)
SELECT abs(s_suppkey - 26) AS fz0, s_name, s_nationkey FROM supplier WHERE NOT ((s_suppkey + 1 < 178 AND s_suppkey = 408)) ORDER BY s_suppkey DESC LIMIT 17
SELECT c_mktsegment, count(*) AS fz_cnt, max(o_orderkey) AS fz_max, sum(o_orderkey) AS fz_sum FROM orders JOIN customer ON o_custkey = c_custkey WHERE (o_orderkey IN (9, 133) AND o_orderpriority LIKE 's%') GROUP BY c_mktsegment
SELECT lower(s_name) AS fz0, s_suppkey FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE NOT (n_name NOT LIKE '%e%'))
SELECT n_nationkey + 8 AS fz0, n_name, upper(n_name) AS fz2, n_nationkey FROM nation WHERE (n_nationkey + 4 < 1269 AND n_regionkey BETWEEN 626 AND 665)
SELECT n_name FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey
SELECT CASE WHEN s_acctbal >= 7097.60 THEN s_nationkey ELSE -2 END AS fz0, abs(s_nationkey - 76) AS fz1, abs(s_nationkey - 81) AS fz2, s_nationkey + 8 AS fz3 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE NOT (n_regionkey <= 1974))
SELECT o_custkey AS fz_k FROM orders WHERE (o_orderstatus LIKE 'w%' AND o_totalprice >= 6436.75) UNION SELECT c_custkey AS fz_k FROM customer WHERE NOT (c_custkey BETWEEN 349 AND 514)
SELECT DISTINCT o_orderkey, abs(o_orderkey - 91) AS fz1, o_orderkey AS fzd2 FROM orders WHERE o_totalprice > 4467.1
SELECT abs(n_regionkey - 47) AS fz0, s_suppkey * 9 AS fz1, n_regionkey FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey WHERE (length(n_name) < 16 AND length(n_name) >= 10)
SELECT substring(s_name, 1, 4) AS fz0, abs(s_suppkey - 45) AS fz1, substring(s_name, 1, 3) AS fz2 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_regionkey <= 648 AND n_regionkey < 1724))
SELECT n_regionkey AS fz_k FROM nation WHERE (n_nationkey <> 675 AND length(n_name) < 11) UNION SELECT r_regionkey AS fz_k FROM region WHERE NOT (r_name LIKE 'v%')
SELECT abs(o_orderkey - 83) AS fz0, CASE WHEN o_orderkey IN (152, 167, 198, 133) THEN o_orderkey ELSE 0 END AS fz1, upper(o_orderstatus) AS fz2, o_totalprice FROM orders WHERE NOT (NOT (o_orderstatus NOT LIKE '%m%')) ORDER BY o_orderkey LIMIT 37
SELECT r_regionkey, count(*) AS fz_cnt, min(n_nationkey) AS fz_min, max(n_regionkey) AS fz_max FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_regionkey HAVING count(*) > 4
SELECT CASE WHEN c_custkey IN (197, 118, 35) THEN c_nationkey ELSE -5 END AS fz0, c_name, substring(c_name, 1, 4) AS fz2 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey BETWEEN 1468 AND 1850)
SELECT o_custkey AS fz_k FROM orders WHERE (o_orderpriority NOT LIKE '%k%' OR o_custkey BETWEEN 1313 AND 1453) UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE c_acctbal > 4675.15
SELECT o_orderkey FROM orders WHERE o_totalprice >= 5531.4 ORDER BY o_orderkey LIMIT 20
SELECT c_name, count(*) AS fz_cnt, min(o_custkey) AS fz_min, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey WHERE length(o_orderstatus) > 9 GROUP BY c_name HAVING count(*) > 1
SELECT c_nationkey - 7 AS fz0, abs(c_nationkey - 50) AS fz1, c_mktsegment, c_custkey FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 655)
SELECT length(c_name) AS fz0, upper(c_name) AS fz1 FROM customer WHERE (NOT (c_custkey IN (96, 32)) OR (length(c_name) >= 9 OR c_mktsegment NOT LIKE '%x%'))
SELECT o_orderstatus FROM orders WHERE (length(o_orderpriority) >= 15 AND o_custkey + 5 < 1209)
SELECT abs(c_custkey - 72) AS fz0, abs(n_regionkey - 40) AS fz1, abs(n_nationkey - 15) AS fz2 FROM customer INNER JOIN nation ON c_nationkey = n_nationkey
SELECT r_name, count(*) AS fz_cnt, min(n_nationkey) AS fz_min, max(n_nationkey) AS fz_max, sum(n_regionkey) AS fz_sum FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (n_regionkey < 1070 AND n_name NOT LIKE '%n%') GROUP BY r_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.75
SELECT p_size * 3 AS fz0, abs(p_partkey - 22) AS fz1, p_partkey, p_retailprice FROM part WHERE (p_name NOT LIKE '%h%' OR (p_retailprice <= 5506.36 AND p_type NOT LIKE '%g%'))
SELECT CASE WHEN n_regionkey = 912 THEN n_nationkey ELSE -1 END AS fz0, n_name || '_x' AS fz1 FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_acctbal < 6622.44
SELECT o_orderkey, count(*) AS fz_cnt, min(o_orderkey) AS fz_min, sum(o_orderkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders WHERE o_custkey IN (61, 186, 38, 19, 30) GROUP BY o_orderkey HAVING count(*) > 3
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT min(o_totalprice) FROM orders) * 0.75
SELECT p_type, p_name, p_size - 1 AS fz2, p_brand || '_x' AS fz3 FROM part WHERE p_size <= 820
SELECT n_nationkey + 8 AS fz0 FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey WHERE NOT (s_acctbal <= 5200.79)
SELECT o_custkey, count(*) AS fz_cnt, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders GROUP BY o_custkey
SELECT o_custkey AS fz_k FROM orders WHERE o_orderpriority NOT LIKE '%h%' EXCEPT SELECT c_custkey AS fz_k FROM customer WHERE c_acctbal <= 2207.62
SELECT abs(o_custkey - 72) AS fz0 FROM orders WHERE ((o_totalprice < 8106.86 AND length(o_orderpriority) >= 7) OR o_orderpriority NOT LIKE '%f%') ORDER BY o_orderkey DESC LIMIT 38
SELECT s_acctbal, n_name FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey
SELECT p_partkey, count(*) AS fz_cnt, sum(CAST(p_retailprice AS DECIMAL(18,2))) AS fz_dsum FROM part GROUP BY p_partkey HAVING count(*) > 4
SELECT o_custkey AS fz_k FROM orders WHERE NOT (o_custkey + 7 < 1540) UNION SELECT c_custkey AS fz_k FROM customer WHERE (c_mktsegment LIKE 'x%' OR c_name NOT LIKE '%l%')
SELECT o_custkey - 6 AS fz0, CASE WHEN o_orderkey = 1458 THEN o_orderkey ELSE 0 END AS fz1 FROM orders WHERE ((length(o_orderstatus) > 17 OR o_custkey BETWEEN 485 AND 568) AND o_custkey BETWEEN 311 AND 566)
SELECT n_nationkey, n_nationkey + 7 AS fz1, n_regionkey, length(n_name) AS fz3 FROM nation WHERE (n_regionkey > 1764 AND NOT (n_name NOT LIKE '%w%'))
SELECT s_suppkey * 9 AS fz0 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE (s_suppkey BETWEEN 675 AND 1068 OR s_suppkey BETWEEN 607 AND 893)
SELECT s_suppkey * 3 AS fz0, CASE WHEN s_acctbal >= 5010.58 THEN s_nationkey ELSE -6 END AS fz1 FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1019)
SELECT c_nationkey AS fz_k FROM customer WHERE c_nationkey IN (51, 181, 136, 102) UNION SELECT s_nationkey AS fz_k FROM supplier WHERE (s_suppkey IN (113, 130) OR s_suppkey BETWEEN 303 AND 455)
SELECT CASE WHEN n_name NOT LIKE '%n%' THEN n_regionkey ELSE -2 END AS fz0 FROM nation WHERE (NOT (n_regionkey + 2 < 821) AND n_regionkey IN (62, 30, 145, 172, 59))
SELECT n_name, count(*) AS fz_cnt, max(s_suppkey) AS fz_max, sum(s_suppkey) AS fz_sum FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
SELECT s_nationkey FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE NOT (length(n_name) >= 6))
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_acctbal >= 2736.24) UNION SELECT s_nationkey AS fz_k FROM supplier WHERE (s_name NOT LIKE '%a%' OR s_acctbal > 3746.83)
SELECT n_name || '_x' AS fz0, substring(n_name, 1, 2) AS fz1 FROM nation WHERE n_nationkey BETWEEN 1388 AND 1477
SELECT n_name, count(*) AS fz_cnt, max(c_custkey) AS fz_max, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE (c_custkey + 2 < 1161 OR c_acctbal > 8335.5) GROUP BY n_name
SELECT c_name, c_name || '_x' AS fz1, c_custkey, abs(c_nationkey - 25) AS fz3 FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE (length(n_name) < 17 AND n_nationkey BETWEEN 982 AND 1372))
SELECT DISTINCT lower(p_type) AS fz0, lower(p_name) AS fz1, p_partkey FROM part WHERE p_partkey IN (17, 72, 118, 65, 174)
SELECT DISTINCT abs(n_nationkey - 55) AS fz0, n_name, n_regionkey + 7 AS fz2 FROM nation WHERE ((n_nationkey < 34 AND n_name LIKE 'd%') AND (n_regionkey IN (181, 143, 88) AND n_nationkey + 8 < 428))
SELECT c_mktsegment, count(*) AS fz_cnt, min(o_custkey) AS fz_min, max(o_orderkey) AS fz_max, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey WHERE (o_orderpriority NOT LIKE '%e%' OR o_orderpriority LIKE 'd%') GROUP BY c_mktsegment
SELECT upper(c_mktsegment) AS fz0, CASE WHEN c_mktsegment NOT LIKE '%f%' THEN c_nationkey ELSE -1 END AS fz1, c_custkey + 9 AS fz2, abs(c_nationkey - 68) AS fz3 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE (n_regionkey IN (82, 148, 193, 72, 25) OR n_nationkey = 1060))
SELECT p_partkey * 3 AS fz0, p_partkey, abs(p_partkey - 35) AS fz2, p_type || '_x' AS fz3 FROM part WHERE (length(p_name) < 14 AND NOT (p_retailprice <= 4387.2)) ORDER BY p_partkey LIMIT 29
SELECT n_regionkey - 1 AS fz0 FROM nation WHERE NOT ((n_nationkey + 8 < 1048 AND n_nationkey IN (24, 58)))
SELECT c_nationkey * 7 AS fz0, c_nationkey + 8 AS fz1, n_nationkey - 3 AS fz2 FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
SELECT r_regionkey, count(*) AS fz_cnt FROM region GROUP BY r_regionkey HAVING count(*) > 2
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT min(s_acctbal) FROM supplier) * 0.5
SELECT DISTINCT n_regionkey, substring(n_name, 1, 1) AS fz1 FROM nation WHERE (n_regionkey < 769 OR (n_regionkey IN (22, 51) AND length(n_name) < 17))
SELECT n_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
SELECT r_regionkey, count(*) AS fz_cnt FROM region WHERE (length(r_name) <= 9 AND r_name LIKE 'r%') GROUP BY r_regionkey
SELECT c_nationkey AS fz_k FROM customer WHERE (c_nationkey BETWEEN 897 AND 1153 AND length(c_mktsegment) < 7) EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE s_nationkey > 1975
SELECT abs(n_nationkey - 57) AS fz0, abs(n_nationkey - 35) AS fz1, abs(n_regionkey - 34) AS fz2 FROM nation WHERE (NOT (length(n_name) > 6) AND n_nationkey IN (145, 13, 183, 191, 91)) ORDER BY n_nationkey DESC LIMIT 8
SELECT abs(n_regionkey - 24) AS fz0, CASE WHEN s_suppkey + 9 < 1229 THEN s_suppkey ELSE 0 END AS fz1, lower(s_name) AS fz2 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE s_nationkey BETWEEN 653 AND 746
SELECT r_regionkey, count(*) AS fz_cnt, min(r_regionkey) AS fz_min, max(r_regionkey) AS fz_max, sum(r_regionkey) AS fz_sum FROM region GROUP BY r_regionkey HAVING count(*) > 0
SELECT c_nationkey AS fz_k FROM customer WHERE c_nationkey + 3 < 1481 EXCEPT SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (length(s_name) >= 15)
SELECT n_name, n_nationkey, lower(n_name) AS fz2 FROM nation WHERE length(n_name) < 18 ORDER BY n_nationkey LIMIT 23
SELECT CASE WHEN s_suppkey IN (149, 119) THEN s_suppkey ELSE -8 END AS fz0, abs(s_nationkey - 44) AS fz1 FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE (s_acctbal <= 8405.17 AND s_acctbal > 8289.48)
SELECT s_name, count(*) AS fz_cnt, min(s_nationkey) AS fz_min, max(s_nationkey) AS fz_max FROM supplier GROUP BY s_name
SELECT c_nationkey AS fz_k FROM customer WHERE (c_nationkey IN (189, 115, 88) OR c_nationkey + 1 < 1592) UNION SELECT s_nationkey AS fz_k FROM supplier WHERE (s_nationkey >= 1371 AND s_nationkey + 1 < 197)
SELECT o_orderpriority, CASE WHEN length(o_orderstatus) <= 8 THEN o_orderkey ELSE -6 END AS fz1, CASE WHEN o_totalprice >= 6009.47 THEN o_custkey ELSE -6 END AS fz2 FROM orders JOIN customer ON o_custkey = c_custkey WHERE (o_orderkey + 5 < 1422 OR o_orderpriority LIKE 'j%')
SELECT n_regionkey, count(*) AS fz_cnt FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE NOT (c_acctbal < 7766.0) GROUP BY n_regionkey HAVING count(*) > 1
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.75
SELECT CASE WHEN o_orderpriority NOT LIKE '%b%' THEN o_custkey ELSE -5 END AS fz0, CASE WHEN o_custkey IN (39, 138, 83, 99) THEN o_custkey ELSE 0 END AS fz1, CASE WHEN o_custkey IN (144, 73, 86) THEN o_custkey ELSE 0 END AS fz2, o_custkey - 7 AS fz3 FROM orders WHERE o_orderpriority NOT LIKE '%o%'
SELECT n_name, substring(n_name, 1, 4) AS fz1 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE NOT (r_regionkey IN (169, 37, 78, 83))
SELECT r_regionkey, count(*) AS fz_cnt FROM nation JOIN region ON n_regionkey = r_regionkey WHERE NOT (n_name LIKE 'w%') GROUP BY r_regionkey
SELECT o_custkey AS fz_k FROM orders WHERE o_custkey < 1921 INTERSECT SELECT c_custkey AS fz_k FROM customer WHERE (c_custkey IN (107, 39, 156) OR c_name LIKE 'u%')
SELECT o_custkey, abs(o_orderkey - 61) AS fz1, o_orderkey * 2 AS fz2, substring(o_orderstatus, 1, 5) AS fz3 FROM orders WHERE o_orderpriority NOT LIKE '%u%'
SELECT CASE WHEN r_name NOT LIKE '%a%' THEN r_regionkey ELSE 0 END AS fz0 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE n_name NOT LIKE '%g%'
SELECT c_custkey + 7 AS fz0, c_nationkey * 6 AS fz1, abs(c_custkey - 54) AS fz2, c_nationkey FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE (n_name LIKE 'm%' AND n_nationkey BETWEEN 1166 AND 1173))
SELECT o_custkey AS fz_k FROM orders WHERE o_orderstatus LIKE 'c%' INTERSECT SELECT c_custkey AS fz_k FROM customer WHERE c_name NOT LIKE '%t%'
SELECT abs(o_custkey - 1) AS fz0 FROM orders WHERE o_orderstatus LIKE 'h%'
SELECT lower(r_name) AS fz0 FROM nation INNER JOIN region ON n_regionkey = r_regionkey WHERE r_name LIKE 'g%'
SELECT c_mktsegment, c_nationkey * 5 AS fz1, CASE WHEN c_nationkey + 8 < 220 THEN c_custkey ELSE -2 END AS fz2, CASE WHEN c_acctbal <= 6126.41 THEN c_nationkey ELSE -1 END AS fz3 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE (n_name LIKE 'k%' AND n_nationkey <= 1540))
SELECT c_nationkey AS fz_k FROM customer WHERE NOT (c_nationkey BETWEEN 1090 AND 1275) INTERSECT SELECT s_nationkey AS fz_k FROM supplier WHERE s_suppkey + 3 < 502
SELECT CASE WHEN o_totalprice < 1287.96 THEN o_custkey ELSE -3 END AS fz0, o_orderpriority FROM orders WHERE (o_orderkey + 9 < 623 AND NOT (o_orderstatus LIKE 'o%'))
SELECT n_name, abs(s_nationkey - 48) AS fz1 FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey WHERE s_suppkey BETWEEN 1040 AND 1241
SELECT s_suppkey, count(*) AS fz_cnt, max(s_nationkey) AS fz_max, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier WHERE NOT (s_name NOT LIKE '%r%') GROUP BY s_suppkey
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT min(c_acctbal) FROM customer) * 0.5
SELECT p_type, upper(p_name) AS fz1, CASE WHEN p_type NOT LIKE '%q%' THEN p_partkey ELSE -2 END AS fz2, CASE WHEN p_partkey > 732 THEN p_partkey ELSE 0 END AS fz3 FROM part WHERE NOT ((length(p_type) > 19 AND p_size + 4 < 813)) ORDER BY p_partkey DESC LIMIT 15
SELECT abs(o_orderkey - 24) AS fz0 FROM orders JOIN customer ON o_custkey = c_custkey
SELECT n_nationkey, count(*) AS fz_cnt, max(c_nationkey) AS fz_max, sum(c_custkey) AS fz_sum FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_nationkey HAVING count(*) > 2
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT min(o_totalprice) FROM orders) * 0.25
SELECT substring(o_orderstatus, 1, 4) AS fz0 FROM orders WHERE o_orderstatus LIKE 'z%'
SELECT lower(o_orderstatus) AS fz0 FROM orders LEFT JOIN customer ON o_custkey = c_custkey WHERE o_orderpriority LIKE 'p%'
SELECT c_nationkey, count(*) AS fz_cnt, min(o_orderkey) AS fz_min, sum(o_custkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey WHERE (o_totalprice >= 8269.60 OR length(o_orderstatus) < 10) GROUP BY c_nationkey
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.5
SELECT o_orderkey, o_totalprice FROM orders WHERE (o_custkey <> 306 AND (o_orderkey <= 947 AND o_totalprice >= 1513.17))
SELECT c_custkey - 2 AS fz0, length(o_orderstatus) AS fz1, c_name FROM orders JOIN customer ON o_custkey = c_custkey WHERE c_acctbal <= 7169.50
SELECT n_name, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, sum(s_suppkey) AS fz_sum, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders) * 0.5
SELECT DISTINCT o_custkey, o_custkey * 8 AS fz1, abs(o_orderkey - 2) AS fz2 FROM orders WHERE ((o_custkey + 6 < 231 AND o_orderstatus NOT LIKE '%o%') AND NOT (o_orderpriority NOT LIKE '%g%'))
SELECT o_orderstatus, count(*) AS fz_cnt, min(o_custkey) AS fz_min, max(o_custkey) AS fz_max FROM orders GROUP BY o_orderstatus
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT min(c_acctbal) FROM customer) * 0.5
SELECT r_regionkey, abs(r_regionkey - 96) AS fz1, upper(r_name) AS fz2 FROM region WHERE NOT (r_regionkey + 7 < 1243)
SELECT lower(n_name) AS fz0 FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_acctbal < 3341.68
SELECT n_name, count(*) AS fz_cnt, max(c_nationkey) AS fz_max, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_nationkey BETWEEN 695 AND 703 GROUP BY n_name HAVING count(*) > 0
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < (SELECT min(o_totalprice) FROM orders) * 0.75
SELECT p_name, CASE WHEN p_size + 8 < 696 THEN p_size ELSE -9 END AS fz1, CASE WHEN p_retailprice > 7178.30 THEN p_size ELSE -3 END AS fz2, p_size FROM part WHERE (NOT (length(p_type) > 7) AND p_size > 220) ORDER BY p_partkey LIMIT 41
SELECT c_nationkey + 6 AS fz0, c_custkey - 9 AS fz1, CASE WHEN c_acctbal > 184.92 THEN c_custkey ELSE -9 END AS fz2 FROM customer INNER JOIN nation ON c_nationkey = n_nationkey WHERE NOT (n_name LIKE 'e%')
SELECT c_custkey, count(*) AS fz_cnt, max(o_custkey) AS fz_max FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderpriority LIKE 'i%' GROUP BY c_custkey
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT min(c_acctbal) FROM customer) * 0.5
SELECT DISTINCT p_partkey + 3 AS fz0 FROM part WHERE (p_partkey > 1534 AND p_retailprice >= 1250.50)
SELECT upper(c_mktsegment) AS fz0, CASE WHEN c_acctbal >= 6936.1 THEN c_custkey ELSE -2 END AS fz1 FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE n_regionkey + 1 < 1237
SELECT n_nationkey, count(*) AS fz_cnt, min(s_nationkey) AS fz_min, max(s_suppkey) AS fz_max FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_nationkey
SELECT o_custkey AS fz_k FROM orders WHERE (o_orderpriority LIKE 's%' AND length(o_orderstatus) >= 10) UNION SELECT c_custkey AS fz_k FROM customer WHERE NOT (c_nationkey IN (99, 137, 36))
SELECT p_partkey FROM part WHERE ((p_type LIKE 'u%' OR p_name NOT LIKE '%a%') AND (p_size IN (106, 148) AND p_retailprice >= 2397.41))
SELECT n_regionkey, s_nationkey, CASE WHEN n_regionkey IN (10, 105, 23) THEN n_regionkey ELSE -7 END AS fz2 FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey WHERE (s_nationkey = 635 AND length(s_name) <= 8)
SELECT c_nationkey + 1 AS fz0 FROM customer JOIN nation ON c_nationkey = n_nationkey
SELECT length(c_mktsegment) AS fz0 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE (n_nationkey >= 448 AND n_regionkey IN (84, 188, 140, 10)))
SELECT o_custkey AS fz_k FROM orders WHERE (length(o_orderstatus) > 10 AND o_custkey + 1 < 304) EXCEPT SELECT c_custkey AS fz_k FROM customer WHERE NOT (length(c_mktsegment) >= 18)
SELECT c_mktsegment, c_nationkey + 1 AS fz1, CASE WHEN c_acctbal >= 7799.53 THEN c_custkey ELSE -8 END AS fz2 FROM customer WHERE (c_acctbal <= 4601.5 OR c_custkey + 8 < 1943) ORDER BY c_custkey DESC LIMIT 24
SELECT n_regionkey, count(*) AS fz_cnt, min(n_nationkey) AS fz_min FROM nation GROUP BY n_regionkey
SELECT c_acctbal, abs(c_nationkey - 50) AS fz1 FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE NOT (n_regionkey BETWEEN 745 AND 1099))
SELECT c_nationkey + 8 AS fz0 FROM customer WHERE c_mktsegment NOT LIKE '%g%'
SELECT DISTINCT abs(c_custkey - 11) AS fz0, abs(c_custkey - 27) AS fz1, c_mktsegment, CASE WHEN c_acctbal > 8970.2 THEN c_custkey ELSE -9 END AS fz3 FROM customer WHERE ((c_acctbal <= 5139.44 OR c_nationkey IN (35, 57, 175)) AND (c_acctbal <= 1884.87 OR c_name LIKE 'u%'))
SELECT n_nationkey, count(*) AS fz_cnt FROM nation WHERE (n_nationkey <> 1353 AND n_name LIKE 'b%') GROUP BY n_nationkey
SELECT c_custkey, abs(c_custkey - 93) AS fz1, lower(c_name) AS fz2 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE (n_regionkey = 631 AND n_name LIKE 'r%'))
SELECT CASE WHEN length(c_mktsegment) < 9 THEN c_nationkey ELSE -5 END AS fz0 FROM customer WHERE c_nationkey = 1788
SELECT substring(c_name, 1, 2) AS fz0 FROM customer WHERE ((c_acctbal <= 887.78 OR c_custkey IN (57, 7, 195, 45, 119)) AND c_custkey + 5 < 498) ORDER BY c_custkey LIMIT 20
SELECT o_orderstatus, count(*) AS fz_cnt, min(o_custkey) AS fz_min, sum(o_custkey) AS fz_sum FROM orders WHERE o_totalprice >= 5072.29 GROUP BY o_orderstatus
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) * 0.75
SELECT lower(c_name) AS fz0, lower(c_mktsegment) AS fz1 FROM customer WHERE (NOT (c_acctbal > 5986.16) AND NOT (c_acctbal >= 1742.75)) ORDER BY c_custkey LIMIT 28
SELECT CASE WHEN c_custkey <= 121 THEN c_nationkey ELSE -7 END AS fz0, CASE WHEN c_name NOT LIKE '%a%' THEN c_custkey ELSE -1 END AS fz1 FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE (n_regionkey IN (74, 108, 181, 128, 70) OR length(n_name) > 4)
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_custkey IN (53, 114) AND o.o_orderkey BETWEEN 195 AND 268))
SELECT lower(s_name) AS fz0, s_name, s_suppkey * 6 AS fz2 FROM supplier WHERE s_suppkey + 7 < 844 ORDER BY s_suppkey DESC LIMIT 16
SELECT DISTINCT p_brand || '_x' AS fz0, upper(p_brand) AS fz1 FROM part WHERE NOT (NOT (p_type NOT LIKE '%i%'))
SELECT n_regionkey, count(*) AS fz_cnt, sum(n_regionkey) AS fz_sum FROM nation GROUP BY n_regionkey
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (length(o.o_orderpriority) < 9))
SELECT s_acctbal, s_name, s_acctbal AS fzd2, s_name AS fzd3 FROM supplier WHERE NOT ((s_suppkey BETWEEN 265 AND 371 OR s_nationkey <= 1398))
SELECT p_partkey, lower(p_name) AS fz1 FROM part WHERE p_name NOT LIKE '%h%' ORDER BY p_partkey DESC LIMIT 34
SELECT c_mktsegment, count(*) AS fz_cnt, min(c_custkey) AS fz_min, max(c_nationkey) AS fz_max, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer WHERE c_custkey >= 85 GROUP BY c_mktsegment
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT min(s_acctbal) FROM supplier) * 0.25
SELECT CASE WHEN s_acctbal <= 657.99 THEN s_suppkey ELSE -3 END AS fz0 FROM supplier WHERE NOT (s_name NOT LIKE '%p%') ORDER BY s_suppkey DESC LIMIT 17
SELECT CASE WHEN p_type NOT LIKE '%r%' THEN p_partkey ELSE -4 END AS fz0, p_size - 2 AS fz1, upper(p_type) AS fz2 FROM part WHERE (NOT (p_brand NOT LIKE '%u%') OR p_size <= 1941)
SELECT c_mktsegment, count(*) AS fz_cnt, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM customer WHERE (c_acctbal < 8506.42 OR c_name LIKE 'x%') GROUP BY c_mktsegment
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT min(s_acctbal) FROM supplier) * 0.75
SELECT DISTINCT s_nationkey * 8 AS fz0, s_nationkey * 5 AS fz1 FROM supplier WHERE (length(s_name) >= 14 OR (s_name NOT LIKE '%w%' AND s_suppkey IN (86, 56, 98, 195, 110)))
SELECT CASE WHEN o_custkey IN (46, 185, 110, 44) THEN o_custkey ELSE -9 END AS fz0, c_nationkey, o_custkey FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE o_totalprice <= 4889.45
SELECT p_brand, count(*) AS fz_cnt FROM part WHERE (length(p_name) <= 15 OR p_partkey + 4 < 1270) GROUP BY p_brand
SELECT n_regionkey, count(*) AS fz_cnt, min(c_custkey) AS fz_min, sum(c_nationkey) AS fz_sum FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_nationkey = 1647 GROUP BY n_regionkey
SELECT o_custkey AS fz_k FROM orders WHERE NOT (o_custkey + 8 < 996) UNION SELECT c_custkey AS fz_k FROM customer WHERE c_custkey <= 1179
SELECT abs(p_partkey - 57) AS fz0, p_type FROM part WHERE p_size BETWEEN 637 AND 720 ORDER BY p_partkey LIMIT 35
SELECT n_nationkey, s_suppkey FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey
SELECT c_name, count(*) AS fz_cnt, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_totalprice <= 5715.12 GROUP BY c_name
SELECT n_regionkey AS fz_k FROM nation WHERE (n_nationkey + 5 < 387 AND length(n_name) >= 18) UNION ALL SELECT r_regionkey AS fz_k FROM region WHERE (r_regionkey + 9 < 580 OR r_regionkey BETWEEN 957 AND 1062)
SELECT p_size * 6 AS fz0, CASE WHEN p_size <> 68 THEN p_partkey ELSE -4 END AS fz1, CASE WHEN p_brand NOT LIKE '%a%' THEN p_partkey ELSE -2 END AS fz2 FROM part WHERE p_partkey + 4 < 1932
SELECT abs(s_suppkey - 39) AS fz0 FROM supplier INNER JOIN nation ON s_nationkey = n_nationkey
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 7482.69)
SELECT o_custkey AS fz_k FROM orders WHERE (o_totalprice < 8966.30 AND o_orderpriority LIKE 'j%') UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE (c_name LIKE 's%' OR c_mktsegment LIKE 'b%')
SELECT p_brand, p_retailprice, p_partkey, p_partkey - 5 AS fz3 FROM part WHERE (NOT (p_type NOT LIKE '%v%') OR p_retailprice < 2762.75) ORDER BY p_partkey LIMIT 36
SELECT length(o_orderpriority) AS fz0, CASE WHEN o_totalprice < 2477.15 THEN o_orderkey ELSE -7 END AS fz1, c_nationkey FROM orders INNER JOIN customer ON o_custkey = c_custkey WHERE NOT (length(c_mktsegment) > 8)
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_orderstatus NOT LIKE '%o%' OR o.o_totalprice < 310.23))
SELECT n_regionkey AS fz_k FROM nation WHERE n_regionkey + 8 < 1051 UNION ALL SELECT r_regionkey AS fz_k FROM region WHERE (r_regionkey + 3 < 1423 AND r_name LIKE 'x%')
SELECT DISTINCT abs(p_size - 16) AS fz0 FROM part WHERE p_partkey BETWEEN 179 AND 264
SELECT c_nationkey * 4 AS fz0, c_name, lower(c_mktsegment) AS fz2 FROM orders LEFT JOIN customer ON o_custkey = c_custkey WHERE o_totalprice >= 8949.30
SELECT r_name, count(*) AS fz_cnt FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name
SELECT abs(c_nationkey - 6) AS fz0 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (32, 149, 147))
SELECT substring(p_type, 1, 3) AS fz0, p_partkey, CASE WHEN p_retailprice <= 5898.74 THEN p_partkey ELSE -2 END AS fz2, p_size * 1 AS fz3 FROM part WHERE p_name NOT LIKE '%r%'
SELECT n_nationkey + 4 AS fz0, n_regionkey + 4 AS fz1, n_nationkey * 7 AS fz2 FROM nation WHERE NOT (NOT (n_regionkey + 3 < 1296)) ORDER BY n_nationkey DESC LIMIT 37
SELECT r_regionkey, count(*) AS fz_cnt, min(r_regionkey) AS fz_min, sum(r_regionkey) AS fz_sum FROM region WHERE (length(r_name) <= 16 OR length(r_name) > 19) GROUP BY r_regionkey
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT min(c_acctbal) FROM customer) * 0.5
SELECT DISTINCT p_size * 5 AS fz0 FROM part WHERE p_type NOT LIKE '%i%'
SELECT abs(n_nationkey - 39) AS fz0, CASE WHEN n_nationkey IN (24, 189, 196, 107) THEN n_nationkey ELSE -3 END AS fz1, abs(n_regionkey - 50) AS fz2, CASE WHEN n_name NOT LIKE '%c%' THEN n_regionkey ELSE -6 END AS fz3 FROM nation WHERE (NOT (n_nationkey BETWEEN 1211 AND 1301) AND length(n_name) > 14)
SELECT n_nationkey, count(*) AS fz_cnt, min(n_nationkey) AS fz_min, max(n_nationkey) AS fz_max, sum(n_nationkey) AS fz_sum FROM nation WHERE (n_name LIKE 'n%' AND n_nationkey IN (65, 99, 34)) GROUP BY n_nationkey
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) * 0.25
SELECT p_retailprice FROM part WHERE (length(p_brand) < 6 AND (length(p_type) < 13 OR p_partkey <> 661))
SELECT c_nationkey - 9 AS fz0, c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey
SELECT n_nationkey, count(*) AS fz_cnt, max(n_regionkey) AS fz_max FROM nation GROUP BY n_nationkey
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) * 0.5
SELECT p_brand || '_x' AS fz0, p_partkey - 2 AS fz1 FROM part WHERE NOT (length(p_name) > 13)
SELECT o_orderpriority FROM orders JOIN customer ON o_custkey = c_custkey
SELECT upper(n_name) AS fz0, upper(s_name) AS fz1 FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE NOT (length(s_name) <= 12)
SELECT n_regionkey, count(*) AS fz_cnt, min(s_suppkey) AS fz_min, max(s_nationkey) AS fz_max, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE s_name LIKE 'w%' GROUP BY n_regionkey HAVING count(*) > 3
SELECT o_custkey AS fz_k FROM orders WHERE length(o_orderpriority) > 5 UNION SELECT c_custkey AS fz_k FROM customer WHERE (c_acctbal <= 7248.56 OR c_mktsegment NOT LIKE '%a%')
SELECT DISTINCT CASE WHEN c_name LIKE 'c%' THEN c_nationkey ELSE -2 END AS fz0, c_nationkey, c_acctbal, c_nationkey - 7 AS fz3 FROM customer WHERE NOT (length(c_mktsegment) > 15)
SELECT n_nationkey, length(n_name) AS fz1 FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE n_regionkey IN (143, 185, 109, 152)
SELECT upper(c_name) AS fz0, CASE WHEN c_nationkey BETWEEN 789 AND 951 THEN c_nationkey ELSE -4 END AS fz1, upper(c_mktsegment) AS fz2 FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE (n_regionkey IN (27, 82, 159, 56, 50) OR n_name NOT LIKE '%a%'))
SELECT c_nationkey AS fz_k FROM customer WHERE c_acctbal < 5218.27 UNION SELECT s_nationkey AS fz_k FROM supplier WHERE NOT (s_nationkey BETWEEN 326 AND 333)
SELECT DISTINCT c_mktsegment || '_x' AS fz0, c_custkey, CASE WHEN length(c_name) >= 4 THEN c_custkey ELSE -8 END AS fz2, length(c_mktsegment) AS fz3 FROM customer WHERE ((length(c_mktsegment) < 9 AND c_custkey >= 1332) AND NOT (c_nationkey + 1 < 1244))
SELECT o_orderpriority FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_custkey BETWEEN 1324 AND 1521
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (o.o_custkey + 3 < 720))
SELECT o_custkey AS fz_k FROM orders WHERE NOT (o_orderstatus LIKE 'i%') UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE (c_mktsegment NOT LIKE '%h%' AND length(c_name) <= 16)
SELECT abs(c_nationkey - 81) AS fz0 FROM customer WHERE length(c_name) >= 16
SELECT s_name, count(*) AS fz_cnt, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS fz_dsum FROM supplier WHERE (s_nationkey IN (155, 97) OR s_acctbal <= 2167.5) GROUP BY s_name
SELECT c_mktsegment FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name NOT LIKE '%l%')
SELECT o_custkey AS fz_k FROM orders WHERE (o_orderkey IN (179, 57, 54, 15) OR o_custkey BETWEEN 1007 AND 1189) UNION ALL SELECT c_custkey AS fz_k FROM customer WHERE (c_nationkey + 3 < 712 AND c_acctbal >= 2688.72)
SELECT CASE WHEN c_nationkey BETWEEN 1094 AND 1486 THEN c_custkey ELSE -5 END AS fz0, length(c_mktsegment) AS fz1 FROM customer WHERE c_acctbal <= 4472.95 ORDER BY c_custkey LIMIT 38
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND NOT (o.o_orderkey BETWEEN 906 AND 1287))
SELECT o_custkey AS fz_k FROM orders WHERE NOT (o_custkey > 391) EXCEPT SELECT c_custkey AS fz_k FROM customer WHERE (c_custkey + 5 < 1002 OR c_acctbal <= 8605.74)
SELECT abs(s_suppkey - 85) AS fz0, s_suppkey FROM supplier WHERE ((s_suppkey > 942 AND s_name LIKE 'z%') AND (s_acctbal > 8235.7 AND s_name LIKE 'd%')) ORDER BY s_suppkey DESC LIMIT 37
SELECT c_nationkey - 7 AS fz0, c_mktsegment FROM customer INNER JOIN nation ON c_nationkey = n_nationkey WHERE (n_nationkey IN (63, 46, 76, 44) OR n_name LIKE 't%')
SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_orderstatus LIKE 'z%' AND o.o_orderstatus LIKE 'x%'))
SELECT n_regionkey AS fz_k FROM nation WHERE (n_name LIKE 'g%' AND n_regionkey >= 218) EXCEPT SELECT r_regionkey AS fz_k FROM region WHERE r_name NOT LIKE '%z%'
SELECT CASE WHEN s_name LIKE 'i%' THEN s_nationkey ELSE 0 END AS fz0, s_nationkey * 3 AS fz1, abs(s_nationkey - 75) AS fz2 FROM supplier WHERE NOT (NOT (s_name NOT LIKE '%q%'))
SELECT n_nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE (n_regionkey BETWEEN 22 AND 150 OR n_name LIKE 'l%')
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority NOT LIKE '%s%')
SELECT DISTINCT s_suppkey - 8 AS fz0, CASE WHEN length(s_name) <= 10 THEN s_suppkey ELSE -5 END AS fz1 FROM supplier WHERE s_nationkey IN (190, 157, 198)
SELECT s_nationkey * 8 AS fz0, s_suppkey, abs(s_suppkey - 57) AS fz2, s_acctbal FROM supplier WHERE NOT (NOT (s_acctbal < 2761.92))
SELECT abs(c_nationkey - 78) AS fz0, n_regionkey + 6 AS fz1, c_nationkey - 6 AS fz2 FROM customer INNER JOIN nation ON c_nationkey = n_nationkey
SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND (o.o_orderstatus LIKE 'm%' OR o.o_totalprice <= 5202.35))
SELECT DISTINCT n_regionkey, length(n_name) AS fz1 FROM nation WHERE (n_nationkey BETWEEN 127 AND 447 AND n_name NOT LIKE '%q%')
SELECT abs(s_nationkey - 96) AS fz0 FROM supplier WHERE (s_name NOT LIKE '%y%' AND s_acctbal > 4394.97)
SELECT o_custkey, count(*) AS fz_cnt, min(o_orderkey) AS fz_min, max(o_orderkey) AS fz_max, sum(o_custkey) AS fz_sum, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders WHERE (o_totalprice > 3527.80 OR o_orderstatus LIKE 'l%') GROUP BY o_custkey
SELECT o_orderstatus, count(*) AS fz_cnt, max(o_custkey) AS fz_max, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS fz_dsum FROM orders GROUP BY o_orderstatus HAVING count(*) > 4
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT min(c_acctbal) FROM customer) * 0.5
SELECT p_partkey, p_type, abs(p_size - 74) AS fz2 FROM part WHERE NOT (NOT (length(p_name) >= 13))
SELECT abs(o_orderkey - 18) AS fz0 FROM orders JOIN customer ON o_custkey = c_custkey WHERE (length(c_mktsegment) <= 16 OR c_name LIKE 'u%')
SELECT o_orderpriority, count(*) AS fz_cnt, min(o_custkey) AS fz_min, max(o_custkey) AS fz_max FROM orders WHERE (o_totalprice >= 2359.55 AND o_orderkey + 9 < 728) GROUP BY o_orderpriority HAVING count(*) > 0
SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < (SELECT min(c_acctbal) FROM customer) * 0.75
SELECT p_brand, lower(p_type) AS fz1, p_partkey + 7 AS fz2, CASE WHEN p_name NOT LIKE '%f%' THEN p_size ELSE -3 END AS fz3 FROM part WHERE NOT (p_name LIKE 'j%')
SELECT CASE WHEN r_regionkey < 284 THEN r_regionkey ELSE -1 END AS fz0, n_name, r_regionkey + 6 AS fz2 FROM nation JOIN region ON n_regionkey = r_regionkey
SELECT p_partkey, count(*) AS fz_cnt, max(p_partkey) AS fz_max, sum(p_size) AS fz_sum FROM part GROUP BY p_partkey
SELECT o_custkey AS fz_k FROM orders WHERE o_orderpriority LIKE 'n%' INTERSECT SELECT c_custkey AS fz_k FROM customer WHERE c_acctbal >= 1974.23
SELECT CASE WHEN p_name NOT LIKE '%m%' THEN p_partkey ELSE -4 END AS fz0 FROM part WHERE ((p_size >= 1836 AND p_size IN (134, 101)) OR p_partkey + 4 < 1468) ORDER BY p_partkey LIMIT 22
SELECT CASE WHEN r_regionkey BETWEEN 885 AND 1143 THEN r_regionkey ELSE -1 END AS fz0, abs(r_regionkey - 15) AS fz1 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE (n_nationkey BETWEEN 430 AND 670 AND n_nationkey IN (3, 91, 115, 174))
SELECT n_nationkey, count(*) AS fz_cnt, max(n_nationkey) AS fz_max FROM nation GROUP BY n_nationkey
SELECT o_custkey AS fz_k FROM orders WHERE NOT (length(o_orderstatus) >= 15) EXCEPT SELECT c_custkey AS fz_k FROM customer WHERE c_name LIKE 'o%'
SELECT DISTINCT p_retailprice FROM part WHERE p_size IN (65, 18, 169, 132, 88)
SELECT substring(n_name, 1, 5) AS fz0, abs(n_nationkey - 65) AS fz1 FROM nation JOIN region ON n_regionkey = r_regionkey WHERE NOT (n_name LIKE 'm%')
SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > (SELECT max(s_acctbal) FROM supplier) * 0.5
SELECT DISTINCT r_regionkey, r_regionkey * 1 AS fz1 FROM region WHERE r_regionkey BETWEEN 861 AND 1245

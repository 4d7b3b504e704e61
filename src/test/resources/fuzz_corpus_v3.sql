-- Seeded fuzz corpus v3: seed 20260816, 60 queries. Regenerable via SqlFuzzer;
-- FuzzSpec asserts the generator reproduces this file byte-identically.
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 2 FROM t WHERE n < 19) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 2 UNION ALL SELECT n + 2 FROM t WHERE n < 15) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 3) % 10 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey + 1 < 369) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 2 FROM t WHERE n < 12) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 2 UNION ALL SELECT n + 3 FROM t WHERE n < 5) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 2) % 11 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey = 1480) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 3 FROM t WHERE n < 25) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 2 UNION ALL SELECT n + 3 FROM t WHERE n < 18) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 6) % 11 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey = 591) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 2 FROM t WHERE n < 16) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 2 UNION ALL SELECT n + 1 FROM t WHERE n < 9) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 5) % 12 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey < 1702) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 3 FROM t WHERE n < 21) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 7) % 8 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey IN (142, 5, 82, 24)) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 3 UNION ALL SELECT n + 3 FROM t WHERE n < 10) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 1 FROM t WHERE n < 12) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 7) % 9 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey IN (5, 10, 135)) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 3 UNION ALL SELECT n + 3 FROM t WHERE n < 23) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 4) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 4) % 9 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey + 5 < 1116) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 1 FROM t WHERE n < 9) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 7) % 8 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 2) % 10 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey + 2 < 228) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 3 FROM t WHERE n < 22) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 3 UNION ALL SELECT n + 3 FROM t WHERE n < 17) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 2) % 5 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey BETWEEN 1020 AND 1118) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey IN (11, 182)) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 3 UNION ALL SELECT n + 3 FROM t WHERE n < 8) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 5) % 6 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey BETWEEN 1147 AND 1156) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 2 UNION ALL SELECT n + 2 FROM t WHERE n < 13) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 3 FROM t WHERE n < 16) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 4) % 7 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey BETWEEN 1273 AND 1593) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 2 UNION ALL SELECT n + 3 FROM t WHERE n < 26) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 1 FROM t WHERE n < 7) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 4) % 7 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey IN (31, 153, 29, 53, 70)) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 3 UNION ALL SELECT n + 3 FROM t WHERE n < 18) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 3 UNION ALL SELECT n + 1 FROM t WHERE n < 7) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 3 FROM t WHERE n < 20) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 3) % 7 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey IN (105, 172, 143, 57, 85)) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 3 UNION ALL SELECT n + 2 FROM t WHERE n < 20) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 2 FROM t WHERE n < 9) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 6) % 8 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey IN (17, 177, 44)) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h
WITH RECURSIVE t(n) AS (SELECT 0 UNION ALL SELECT n + 2 FROM t WHERE n < 9) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 6) % 7 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE c(id) AS (SELECT 0 UNION SELECT (id + 8) % 9 FROM c) SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c
WITH RECURSIVE h(id, d) AS (SELECT r_regionkey + 100, 0 FROM region UNION ALL SELECT n_nationkey, h.d + 1 FROM nation JOIN h ON n_regionkey + 100 = h.id WHERE n_nationkey + 8 < 528) SELECT CAST(count(1) AS BIGINT) AS fz_n, CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.exec.Executor
import graft.sources.Tables

/** Driver-contract queries routed through the graft SQL engine itself
  * (parser → compiler → Catalyst): each entry executes dialect SQL via
  * [[graft.exec.Executor]] over the parquet scope, and is hash-checked
  * against DuckDB running the equivalent ANSI SQL. This makes the
  * correctness gate exercise the engine end-to-end, not just the
  * DataFrame API.
  *
  * Keys are prefixed `fq_` (framequery-dialect surface).
  */
object EngineSql {

  /** name -> (engine dialect SQL, duckdb oracle SQL) */
  private val defs: Map[String, (String, String)] = {
    def same(sql: String): (String, String) = (sql, sql)
    Map(
      // group by ordinal + order by ordinal (reference §2.4/§2.6)
      "fq_group_ordinal" -> same(
        """select n_regionkey, count(1) as cnt from nation group by 1 order by 1"""),

      // equi join + WHERE + group by name
      "fq_join_agg" -> same(
        """select n_name, count(1) as n_cust from customer
          |join nation on c_nationkey = n_nationkey
          |where c_acctbal > 0 group by n_name order by n_name""".stripMargin),

      // implicit cross join with WHERE promotion (Catalyst pushes it into
      // the join; reference does this by hand, _executor.py:355-366)
      "fq_cross_where" -> same(
        """select count(1) as n from nation, region
          |where n_regionkey = r_regionkey""".stripMargin),

      // searched CASE + aggregation
      "fq_case" -> same(
        """select o_orderpriority,
          |  sum(case when o_orderstatus = 'F' then 1 else 0 end) as n_f,
          |  count(1) as n from orders
          |group by o_orderpriority order by o_orderpriority""".stripMargin),

      // LIKE pushdown to the scan
      "fq_like" -> same(
        """select count(1) as n from part where p_name like '%green%'"""),

      // IN value list
      "fq_in_list" -> same(
        """select n_name from nation where n_regionkey in (0, 2) order by n_name"""),

      // window function in a derived table + filter over it
      "fq_window" -> same(
        """select o_custkey, o_orderkey, rn from (
          |  select o_custkey, o_orderkey,
          |    row_number() over (partition by o_custkey
          |                       order by o_totalprice desc, o_orderkey) as rn
          |  from orders) t
          |where rn <= 2 order by o_custkey, rn""".stripMargin),

      // CTE
      "fq_cte" -> same(
        """with big as (
          |  select o_custkey, o_totalprice from orders where o_totalprice > 100000)
          |select o_custkey, count(1) as n from big
          |group by o_custkey having count(1) > 8 order by o_custkey""".stripMargin),

      // theta (non-equi) self join
      "fq_theta" -> (
        """select a.n_regionkey as rk, count(1) as n_pairs
          |from nation as a join nation as b
          |on a.n_regionkey = b.n_regionkey and a.n_nationkey < b.n_nationkey
          |group by a.n_regionkey order by rk""".stripMargin,
        """select a.n_regionkey as rk, count(1) as n_pairs
          |from nation a join nation b
          |on a.n_regionkey = b.n_regionkey and a.n_nationkey < b.n_nationkey
          |group by a.n_regionkey order by rk""".stripMargin),

      // set operation
      "fq_union" -> same(
        """select c_nationkey as k from customer where c_acctbal > 9000
          |union
          |select s_nationkey as k from supplier order by k""".stripMargin),

      // distinct + order
      "fq_distinct" -> same(
        """select distinct o_orderpriority from orders order by 1"""),

      // deterministic limit/offset
      "fq_limit_offset" -> same(
        """select o_orderkey, o_totalprice from orders
          |order by o_totalprice desc, o_orderkey limit 5 offset 3""".stripMargin),

      // string functions incl. PG special forms
      "fq_string_funcs" -> same(
        """select n_name, lower(n_name) as lo,
          |  position('A' in n_name) as p,
          |  trim(both 'AN' from n_name) as t,
          |  n_name || '_x' as cat
          |from nation order by n_name""".stripMargin),

      // ^ is POWER in both our dialect and DuckDB
      "fq_pow" -> same(
        """select cast(sum(cast(l_quantity ^ 2.0 as decimal(18,6))) as double) as qsq
          |from lineitem where l_orderkey < 100""".stripMargin),

      // distinct aggregate
      "fq_count_distinct" -> same(
        """select count(distinct o_custkey) as n from orders"""),

      // IN (subquery) → semi join
      "fq_in_subquery" -> same(
        """select count(1) as n from customer
          |where c_custkey in (select o_custkey from orders
          |                    where o_totalprice > 150000)""".stripMargin),

      // generate_series table function (registered here; dead code in the
      // reference, util/_funcs.py:161-167)
      "fq_generate_series" -> same(
        """select count(1) as n, sum(generate_series) as s
          |from generate_series(1, 100000)""".stripMargin),

      // LATERAL json_each over the events.props JSON column
      "fq_json_lateral" -> (
        """select j.key, count(1) as n, sum(cast(j.value as bigint)) as s
          |from events, lateral json_each(props) as j
          |group by j.key order by j.key""".stripMargin,
        """select 'k' as key, count(1) as n,
          |  sum(cast(props->>'k' as bigint)) as s
          |from events group by 1 order by key""".stripMargin),

      // decimal-exact revenue through the engine dialect
      "fq_revenue" -> same(
        """select l_returnflag,
          |  cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6)))
          |       as double) as revenue
          |from lineitem group by l_returnflag order by l_returnflag""".stripMargin)
    )
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (name, (engineSql, _)) =>
      name -> ((s: SparkSession, dir: String) =>
        Executor.execute(engineSql, Tables.scope(s, dir), s))
    }

  def oracleSql: Map[String, String] =
    defs.map { case (name, (_, oracle)) => name -> oracle }
}

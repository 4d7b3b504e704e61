package graft.compiler

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** Synthesized PostgreSQL system catalogs: the reflection surface that
  * makes `psql \dt` / `\d table`, JDBC metadata, and SQLAlchemy
  * inspection work against [[graft.server.PgWireServer]].
  *
  * The reference exposes reflection through its SQLAlchemy dialect's
  * `get_table_names` (reference src/framequery/alchemy/dialect.py:57-60,
  * tested in tests/test__alchemy.py) — one method over `executor.scope`.
  * Speaking the wire protocol instead of a Python DBAPI, the equivalent
  * surface is the pg_catalog relations those clients introspect with:
  * pg_class/pg_namespace/pg_attribute synthesized from the live scope,
  * pg_type from the engine's advertised OID set, and empty-but-typed
  * relations for the objects the engine does not have (indexes,
  * constraints, inheritance) so client queries against them return
  * zero rows rather than errors.
  *
  * Everything here is driver-local metadata: row counts are O(tables +
  * columns), so these never touch the cluster — catalog queries stay
  * LocalTableScan plans regardless of data scale.
  */
object PgCatalog {

  val PublicNsOid = 2200L
  val CatalogNsOid = 11L
  val InfoSchemaNsOid = 13427L
  /** the one table access method, mirroring PG's heap AM row */
  val HeapAmOid = 2L

  /** Spark type → advertised PG type OID. Shared contract with the wire
    * server's RowDescription (PgWireServer delegates here) and
    * pg_attribute.atttypid — clients cross-reference the two, so they
    * must agree. */
  def typeOid(dt: DataType): Int = dt match {
    case BooleanType => 16
    case ByteType | ShortType => 21
    case IntegerType => 23
    case LongType => 20
    case FloatType => 700
    case DoubleType => 701
    case _: DecimalType => 1700
    case DateType => 1082
    case TimestampType | TimestampNTZType => 1114
    case _ => 25
  }

  /** (oid, typname, typcategory, typlen) for every OID the engine
    * advertises — the pg_type working set plus the common aliases
    * clients probe for. */
  private val typeRows: Seq[(Long, String, String, Int)] = Seq(
    (16L, "bool", "B", 1),
    (17L, "bytea", "U", -1),
    (18L, "char", "Z", 1),
    (19L, "name", "S", 64),
    (20L, "int8", "N", 8),
    (21L, "int2", "N", 2),
    (23L, "int4", "N", 4),
    (25L, "text", "S", -1),
    (26L, "oid", "N", 4),
    (700L, "float4", "N", 4),
    (701L, "float8", "N", 8),
    (1042L, "bpchar", "S", -1),
    (1043L, "varchar", "S", -1),
    (1082L, "date", "D", 4),
    (1114L, "timestamp", "D", 8),
    (1184L, "timestamptz", "D", 8),
    (1700L, "numeric", "N", -1))

  /** `format_type(atttypid, atttypmod)` over the advertised OID set —
    * a codegen'd CASE chain, no UDF. */
  def formatType(oid: Column, typmod: Column): Column = {
    val pretty = Map(16L -> "boolean", 20L -> "bigint", 21L -> "smallint",
      23L -> "integer", 700L -> "real", 701L -> "double precision",
      1114L -> "timestamp without time zone",
      1184L -> "timestamp with time zone")
    typeRows.foldLeft(lit(null).cast("string")) { case (acc, (o, name, _, _)) =>
      when(oid.cast("long") === o, lit(pretty.getOrElse(o, name))).otherwise(acc)
    }
  }

  /** Dispatch by bare catalog relation name (`pg_*`). `oidOf` assigns
    * the session-stable relation OID for a scope table name. */
  def catalogTable(spark: SparkSession, name: String,
      scope: Seq[(String, DataFrame)],
      oidOf: String => Long,
      pks: Map[String, (String, Seq[String])] = Map.empty,
      fks: Map[String, Seq[(String, String, String, String)]] = Map.empty)
      : Option[DataFrame] = name match {
    case "pg_namespace" => Some(pgNamespace(spark))
    case "pg_class" => Some(pgClass(spark, scope, oidOf, pks))
    case "pg_attribute" => Some(pgAttribute(spark, scope, oidOf))
    case "pg_type" => Some(pgType(spark))
    case "pg_am" => Some(pgAm(spark))
    case "pg_attrdef" => Some(empty(spark,
      "adrelid" -> LongType, "adnum" -> IntegerType, "adbin" -> StringType))
    case "pg_collation" => Some(empty(spark,
      "oid" -> LongType, "collname" -> StringType,
      "collnamespace" -> LongType))
    case "pg_constraint" => Some(pgConstraint(spark, scope, oidOf, pks, fks))
    case "pg_index" => Some(pgIndex(spark, scope, oidOf, pks))
    case "pg_inherits" => Some(empty(spark,
      "inhrelid" -> LongType, "inhparent" -> LongType,
      "inhseqno" -> IntegerType, "inhdetachpending" -> BooleanType))
    case "pg_statistic_ext" => Some(empty(spark,
      "oid" -> LongType, "stxrelid" -> LongType, "stxname" -> StringType,
      "stxnamespace" -> LongType, "stxstattarget" -> IntegerType,
      "stxkeys" -> ArrayType(IntegerType),
      "stxkind" -> ArrayType(StringType)))
    case "pg_policy" => Some(empty(spark,
      "oid" -> LongType, "polname" -> StringType, "polrelid" -> LongType,
      "polcmd" -> StringType, "polpermissive" -> BooleanType,
      "polroles" -> ArrayType(LongType),
      "polqual" -> StringType, "polwithcheck" -> StringType))
    case "pg_publication" => Some(empty(spark,
      "oid" -> LongType, "pubname" -> StringType, "pubowner" -> LongType,
      "puballtables" -> BooleanType, "pubinsert" -> BooleanType,
      "pubupdate" -> BooleanType, "pubdelete" -> BooleanType,
      "pubtruncate" -> BooleanType, "pubviaroot" -> BooleanType))
    case "pg_publication_rel" => Some(empty(spark,
      "oid" -> LongType, "prpubid" -> LongType, "prrelid" -> LongType))
    case "pg_rewrite" => Some(empty(spark,
      "oid" -> LongType, "rulename" -> StringType, "ev_class" -> LongType,
      "ev_type" -> StringType, "ev_enabled" -> StringType))
    case "pg_trigger" => Some(empty(spark,
      "oid" -> LongType, "tgname" -> StringType, "tgrelid" -> LongType,
      "tgenabled" -> StringType, "tgisinternal" -> BooleanType))
    case "pg_description" => Some(empty(spark,
      "objoid" -> LongType, "classoid" -> LongType,
      "objsubid" -> IntegerType, "description" -> StringType))
    case "pg_roles" => Some(spark.createDataFrame(
      java.util.List.of(Row(10L, "graft", true, true)),
      StructType(Seq(StructField("oid", LongType),
        StructField("rolname", StringType),
        StructField("rolsuper", BooleanType),
        StructField("rolcanlogin", BooleanType)))))
    case _ => None
  }

  /** information_schema.{schemata,tables,columns} — the ANSI face of the
    * same scope reflection (SQLAlchemy and many BI tools read these). */
  def infoSchemaTable(spark: SparkSession, name: String,
      scope: Seq[(String, DataFrame)],
      pks: Map[String, (String, Seq[String])] = Map.empty,
      fks: Map[String, Seq[(String, String, String, String)]] = Map.empty)
      : Option[DataFrame] = name match {
    case "table_constraints" =>
      // ANSI face of the declared keys (SQLAlchemy reads these)
      val rows =
        pks.toSeq.sortBy(_._1).map { case (t, (con, _)) =>
          Row("graft", "public", con, "graft", "public", t,
            "PRIMARY KEY", "NO", "NO")
        } ++ fks.toSeq.sortBy(_._1).flatMap { case (t, list) =>
          list.map { case (con, _, _, _) =>
            Row("graft", "public", con, "graft", "public", t,
              "FOREIGN KEY", "NO", "NO")
          }
        }
      Some(spark.createDataFrame(java.util.List.of(rows: _*),
        StructType(Seq(StructField("constraint_catalog", StringType),
          StructField("constraint_schema", StringType),
          StructField("constraint_name", StringType),
          StructField("table_catalog", StringType),
          StructField("table_schema", StringType),
          StructField("table_name", StringType),
          StructField("constraint_type", StringType),
          StructField("is_deferrable", StringType),
          StructField("initially_deferred", StringType)))))
    case "key_column_usage" =>
      val rows =
        pks.toSeq.sortBy(_._1).flatMap { case (t, (con, cols)) =>
          cols.zipWithIndex.map { case (c, i) =>
            Row("graft", "public", con, "graft", "public", t, c, i + 1)
          }
        } ++ fks.toSeq.sortBy(_._1).flatMap { case (t, list) =>
          list.map { case (con, c, _, _) =>
            Row("graft", "public", con, "graft", "public", t, c, 1)
          }
        }
      Some(spark.createDataFrame(java.util.List.of(rows: _*),
        StructType(Seq(StructField("constraint_catalog", StringType),
          StructField("constraint_schema", StringType),
          StructField("constraint_name", StringType),
          StructField("table_catalog", StringType),
          StructField("table_schema", StringType),
          StructField("table_name", StringType),
          StructField("column_name", StringType),
          StructField("ordinal_position", IntegerType)))))
    case "referential_constraints" =>
      val rows = fks.toSeq.sortBy(_._1).flatMap { case (_, list) =>
        list.flatMap { case (con, _, rt, _) =>
          pks.get(rt).map { case (pkCon, _) =>
            Row("graft", "public", con, "graft", "public", pkCon,
              "NONE", "NO ACTION", "NO ACTION")
          }
        }
      }
      Some(spark.createDataFrame(java.util.List.of(rows: _*),
        StructType(Seq(StructField("constraint_catalog", StringType),
          StructField("constraint_schema", StringType),
          StructField("constraint_name", StringType),
          StructField("unique_constraint_catalog", StringType),
          StructField("unique_constraint_schema", StringType),
          StructField("unique_constraint_name", StringType),
          StructField("match_option", StringType),
          StructField("update_rule", StringType),
          StructField("delete_rule", StringType)))))
    case "schemata" => Some(spark.createDataFrame(
      java.util.List.of(
        Row("graft", "public", "graft"),
        Row("graft", "pg_catalog", "graft"),
        Row("graft", "information_schema", "graft")),
      StructType(Seq(StructField("catalog_name", StringType),
        StructField("schema_name", StringType),
        StructField("schema_owner", StringType)))))
    case "tables" => Some(spark.createDataFrame(
      java.util.List.of(scope.map { case (n, _) =>
        Row("graft", "public", n, "BASE TABLE")
      }: _*),
      StructType(Seq(StructField("table_catalog", StringType),
        StructField("table_schema", StringType),
        StructField("table_name", StringType),
        StructField("table_type", StringType)))))
    case "columns" => Some(spark.createDataFrame(
      java.util.List.of(scope.flatMap { case (n, df) =>
        df.schema.fields.zipWithIndex.map { case (f, i) =>
          Row("graft", "public", n, f.name, i + 1,
            if (f.nullable) "YES" else "NO", sqlTypeName(f.dataType),
            typeRows.find(_._1 == typeOid(f.dataType).toLong)
              .map(_._2).getOrElse("text"))
        }
      }: _*),
      StructType(Seq(StructField("table_catalog", StringType),
        StructField("table_schema", StringType),
        StructField("table_name", StringType),
        StructField("column_name", StringType),
        StructField("ordinal_position", IntegerType),
        StructField("is_nullable", StringType),
        StructField("data_type", StringType),
        StructField("udt_name", StringType)))))
    case _ => None
  }

  private def sqlTypeName(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double precision"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp without time zone"
    case _: ArrayType => "ARRAY"
    case _ => "text"
  }

  private def pgNamespace(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.List.of(
        Row(PublicNsOid, "public", 10L, null),
        Row(CatalogNsOid, "pg_catalog", 10L, null),
        Row(InfoSchemaNsOid, "information_schema", 10L, null)),
      StructType(Seq(StructField("oid", LongType),
        StructField("nspname", StringType),
        StructField("nspowner", LongType),
        StructField("nspacl", StringType))))

  /** 1-based attribute positions of a declared key's columns. */
  private def keyAttnums(df: DataFrame, cols: Seq[String]): Seq[Int] =
    cols.map(c => df.schema.fieldNames.indexWhere(_ == c) + 1)

  /** Declared primary keys joined to the live scope:
    * (table, table oid, index relname, index oid, key attnums). */
  private def pkRows(scope: Seq[(String, DataFrame)],
      oidOf: String => Long, pks: Map[String, (String, Seq[String])])
      : Seq[(String, Long, String, Long, Seq[Int])] =
    scope.flatMap { case (n, df) =>
      pks.get(n).map { case (conname, cols) =>
        (n, oidOf(n), conname, oidOf(conname), keyAttnums(df, cols))
      }
    }

  /** pg_index: one row per declared primary key — real rows, not an
    * empty stub, so pgjdbc's getPrimaryKeys join path returns data. */
  private def pgIndex(spark: SparkSession, scope: Seq[(String, DataFrame)],
      oidOf: String => Long,
      pks: Map[String, (String, Seq[String])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("indexrelid", LongType), StructField("indrelid", LongType),
      StructField("indnatts", IntegerType),
      StructField("indnkeyatts", IntegerType),
      StructField("indisunique", BooleanType),
      StructField("indisprimary", BooleanType),
      StructField("indisexclusion", BooleanType),
      StructField("indimmediate", BooleanType),
      StructField("indisclustered", BooleanType),
      StructField("indisvalid", BooleanType),
      StructField("indisreplident", BooleanType),
      StructField("indkey", ArrayType(IntegerType)),
      StructField("indpred", StringType)))
    val rows = pkRows(scope, oidOf, pks).map {
      case (_, relOid, _, idxOid, attnums) =>
        Row(idxOid, relOid, attnums.length, attnums.length,
          true, true, false, true, false, true, false, attnums, null)
    }
    spark.createDataFrame(java.util.List.of(rows: _*), schema)
  }

  /** pg_constraint: `p` rows for declared primary keys and `f` rows for
    * declared foreign keys (conindid of an FK points at the referenced
    * table's PK index, as in PG; confupd/del types are 'a' = NO ACTION —
    * the only action metadata-only keys can promise). */
  private def pgConstraint(spark: SparkSession,
      scope: Seq[(String, DataFrame)], oidOf: String => Long,
      pks: Map[String, (String, Seq[String])],
      fks: Map[String, Seq[(String, String, String, String)]]): DataFrame = {
    val schema = StructType(Seq(
      StructField("oid", LongType), StructField("conname", StringType),
      StructField("connamespace", LongType), StructField("contype", StringType),
      StructField("condeferrable", BooleanType),
      StructField("condeferred", BooleanType),
      StructField("convalidated", BooleanType),
      StructField("conrelid", LongType),
      StructField("contypid", LongType), StructField("conindid", LongType),
      StructField("conparentid", LongType), StructField("confrelid", LongType),
      StructField("conkey", ArrayType(IntegerType)),
      StructField("confkey", ArrayType(IntegerType)),
      StructField("confupdtype", StringType),
      StructField("confdeltype", StringType)))
    val byName = scope.toMap
    val pkConRows = pkRows(scope, oidOf, pks).map {
      case (_, relOid, conname, idxOid, attnums) =>
        Row(oidOf(conname + "$con"), conname, PublicNsOid, "p",
          false, false, true, relOid, 0L, idxOid, 0L, 0L, attnums, null,
          " ", " ")
    }
    val fkConRows = for {
      (t, list) <- fks.toSeq.sortBy(_._1)
      tdf <- byName.get(t).toSeq
      (conname, c, rt, rc) <- list
      rdf <- byName.get(rt).toSeq
      (pkCon, _) <- pks.get(rt).toSeq
    } yield Row(oidOf(conname + "$con"), conname, PublicNsOid, "f",
      false, false, true, oidOf(t), 0L, oidOf(pkCon), 0L, oidOf(rt),
      keyAttnums(tdf, Seq(c)), keyAttnums(rdf, Seq(rc)), "a", "a")
    spark.createDataFrame(
      java.util.List.of(pkConRows ++ fkConRows: _*), schema)
  }

  private def pgClass(spark: SparkSession, scope: Seq[(String, DataFrame)],
      oidOf: String => Long,
      pks: Map[String, (String, Seq[String])] = Map.empty): DataFrame = {
    val schema = StructType(Seq(
      StructField("oid", LongType), StructField("relname", StringType),
      StructField("relnamespace", LongType), StructField("reltype", LongType),
      StructField("relowner", LongType), StructField("relam", LongType),
      StructField("relfilenode", LongType),
      StructField("reltablespace", LongType),
      StructField("relpages", IntegerType),
      StructField("reltuples", FloatType),
      StructField("reltoastrelid", LongType),
      StructField("relhasindex", BooleanType),
      StructField("relpersistence", StringType),
      StructField("relkind", StringType),
      StructField("relnatts", IntegerType),
      StructField("relchecks", IntegerType),
      StructField("relhasrules", BooleanType),
      StructField("relhastriggers", BooleanType),
      StructField("relhassubclass", BooleanType),
      StructField("relrowsecurity", BooleanType),
      StructField("relforcerowsecurity", BooleanType),
      StructField("relispartition", BooleanType),
      StructField("reloftype", LongType),
      StructField("relreplident", StringType),
      StructField("reloptions", ArrayType(StringType)),
      StructField("relacl", StringType)))
    val tableRows = scope.map { case (n, df) =>
      Row(oidOf(n), n, PublicNsOid, 0L, 10L, HeapAmOid, 0L, 0L,
        0, -1.0f, 0L, pks.contains(n), "p", "r", df.schema.length, 0,
        false, false, false, false, false, false, 0L, "d", null, null)
    }
    // index relations for declared primary keys (relkind 'i'), so the
    // `pg_class ci ON ci.oid = i.indexrelid` join resolves the PK name
    val indexRows = pkRows(scope, oidOf, pks).map {
      case (_, _, conname, idxOid, attnums) =>
        Row(idxOid, conname, PublicNsOid, 0L, 10L, 0L, 0L, 0L,
          0, -1.0f, 0L, false, "p", "i", attnums.length, 0,
          false, false, false, false, false, false, 0L, "n", null, null)
    }
    spark.createDataFrame(java.util.List.of(tableRows ++ indexRows: _*), schema)
  }

  private def pgAttribute(spark: SparkSession,
      scope: Seq[(String, DataFrame)], oidOf: String => Long): DataFrame = {
    val schema = StructType(Seq(
      StructField("attrelid", LongType), StructField("attname", StringType),
      StructField("atttypid", LongType), StructField("attlen", IntegerType),
      StructField("attnum", IntegerType),
      StructField("atttypmod", IntegerType),
      StructField("attnotnull", BooleanType),
      StructField("atthasdef", BooleanType),
      StructField("attidentity", StringType),
      StructField("attgenerated", StringType),
      StructField("attisdropped", BooleanType),
      StructField("attislocal", BooleanType),
      StructField("attinhcount", IntegerType),
      StructField("attcollation", LongType),
      StructField("attstorage", StringType),
      StructField("attstattarget", IntegerType),
      StructField("attacl", StringType),
      StructField("attoptions", ArrayType(StringType)),
      StructField("attfdwoptions", ArrayType(StringType))))
    val rows = scope.flatMap { case (n, df) =>
      df.schema.fields.zipWithIndex.map { case (f, i) =>
        val oid = typeOid(f.dataType).toLong
        Row(oidOf(n), f.name, oid,
          typeRows.find(_._1 == oid).map(_._4).getOrElse(-1),
          i + 1, -1, !f.nullable, false, "", "", false, true, 0, 0L,
          "p", -1, null, null, null)
      }
    }
    spark.createDataFrame(java.util.List.of(rows: _*), schema)
  }

  private def pgType(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.List.of(typeRows.map { case (oid, name, cat, len) =>
        Row(oid, name, CatalogNsOid, 10L, len, "b", cat, true, 0L, 0L,
          -1, 0L, false, 0L)
      }: _*),
      StructType(Seq(StructField("oid", LongType),
        StructField("typname", StringType),
        StructField("typnamespace", LongType),
        StructField("typowner", LongType),
        StructField("typlen", IntegerType),
        StructField("typtype", StringType),
        StructField("typcategory", StringType),
        StructField("typisdefined", BooleanType),
        StructField("typrelid", LongType),
        StructField("typelem", LongType),
        StructField("typtypmod", IntegerType),
        StructField("typcollation", LongType),
        StructField("typnotnull", BooleanType),
        // pgjdbc getColumns reads typbasetype (domain base; none here)
        StructField("typbasetype", LongType))))

  private def pgAm(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.List.of(Row(HeapAmOid, "heap", "t")),
      StructType(Seq(StructField("oid", LongType),
        StructField("amname", StringType),
        StructField("amtype", StringType))))

  private def empty(spark: SparkSession,
      cols: (String, DataType)*): DataFrame =
    spark.createDataFrame(java.util.List.of[Row](),
      StructType(cols.map { case (n, t) => StructField(n, t) }))
}

package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Catalog-metadata surface — the reference's Flight SQL metadata handlers
  * (swanlake-core/src/service/handlers/metadata.rs) re-expressed over the
  * Spark catalog.
  *
  * The reference answers these from DuckDB's information_schema with fixed
  * filter lists; here the same result shapes come from `spark.catalog`,
  * and `information_schema.{tables,schemata}` compat temp views are
  * registered so the introspection SQL its clients issue keeps working.
  */
object InfoSchema {

  /** System schemas the reference filters out of every schemata/tables
    * answer (metadata.rs:19-24): `NOT IN (information_schema, pg_catalog)`
    * and `NOT LIKE '__ducklake_metadata%'`.
    */
  val hiddenSchemas: Set[String] = Set("information_schema", "pg_catalog")
  val hiddenSchemaPrefix = "__ducklake_metadata"

  private def visible(schema: String): Boolean =
    !hiddenSchemas.contains(schema) && !schema.startsWith(hiddenSchemaPrefix)

  /** GetCatalogs (metadata.rs:97-142; `PRAGMA database_list`). */
  def catalogs(spark: SparkSession): DataFrame = {
    val rows = spark.catalog.listCatalogs().collect().map(c => Row(c.name)).toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("catalog_name", StringType, nullable = false))))
  }

  /** GetDbSchemas (metadata.rs:166-199) with the reference's filters. */
  def schemata(spark: SparkSession): DataFrame = {
    val cat = spark.catalog.currentCatalog()
    val rows = spark.catalog.listDatabases().collect()
      .filter(d => visible(d.name))
      .map(d => Row(cat, d.name)).toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("catalog_name", StringType),
        StructField("schema_name", StringType))))
  }

  /** GetTables (metadata.rs:223-270): catalog, schema, name, type — with
    * `BASE TABLE` normalized to `TABLE` (metadata.rs:475-482) and temp
    * views surfaced as VIEW. Spark table types: MANAGED/EXTERNAL→TABLE,
    * VIEW/TEMPORARY→VIEW.
    */
  def tables(spark: SparkSession): DataFrame = {
    val cat = spark.catalog.currentCatalog()
    val rows = spark.catalog.listTables().collect()
      .filter(t => Option(t.namespace).forall(ns => ns.forall(visible)))
      .map { t =>
        val typ = t.tableType match {
          case "VIEW" | "TEMPORARY" => "VIEW"
          case _                    => "TABLE" // BASE TABLE normalization
        }
        val schema = Option(t.namespace).filter(_.nonEmpty).map(_.mkString(".")).getOrElse("temp")
        Row(cat, schema, t.name, typ)
      }.toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), tablesSchema)
  }

  val tablesSchema: StructType = StructType(Seq(
    StructField("table_catalog", StringType),
    StructField("table_schema", StringType),
    StructField("table_name", StringType),
    StructField("table_type", StringType)))

  /** GetTables with include_schema=true (metadata.rs:223-270): each row
    * additionally carries the table's Arrow schema as IPC bytes — the
    * Flight SQL `table_schema` column ADBC clients deserialize to plan
    * reads without a round-trip per table.
    */
  def tablesWithSchema(spark: SparkSession): DataFrame = {
    val base = tables(spark).collect()
    val rows = base.map { r =>
      val name = r.getString(2)
      val qualified =
        if (r.getString(1) == "temp") name else s"${r.getString(1)}.$name"
      val ipc = scala.util.Try(
        org.apache.spark.sql.graft.ArrowWire.toIpcStream(spark.table(qualified).limit(0)))
        .getOrElse(Array.empty[Byte])
      Row(r.getString(0), r.getString(1), name, r.getString(3), ipc)
    }.toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      tablesSchema.add(StructField("table_schema", BinaryType)))
  }

  /** GetTableTypes: the constant {TABLE, VIEW} (metadata.rs:294-309). */
  def tableTypes(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("TABLE"), Row("VIEW")), 1),
      StructType(Seq(StructField("table_type", StringType, nullable = false))))

  /** Empty key-metadata answers with the fixed Flight SQL schemas the
    * reference returns (metadata.rs:38-65,324-397 — DuckLake enforces no
    * keys, so primary/exported/imported/cross-reference are all empty).
    */
  val keysSchema: StructType = StructType(Seq(
    StructField("catalog_name", StringType),
    StructField("schema_name", StringType),
    StructField("table_name", StringType),
    StructField("column_name", StringType),
    StructField("key_sequence", IntegerType),
    StructField("key_name", StringType)))

  def primaryKeys(spark: SparkSession): DataFrame = emptyKeys(spark)
  def exportedKeys(spark: SparkSession): DataFrame = emptyKeys(spark)
  def importedKeys(spark: SparkSession): DataFrame = emptyKeys(spark)
  def crossReference(spark: SparkSession): DataFrame = emptyKeys(spark)

  private def emptyKeys(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], keysSchema)

  /** Register `information_schema`-style temp views so client SQL like
    * `SELECT … FROM information_schema.tables WHERE table_type='VIEW'`
    * (metadata_visibility.test) answers. Spark temp views cannot carry a
    * dot, so the views are named `information_schema_{tables,schemata}`
    * and `rewriteInfoSchema` maps the canonical names onto them.
    */
  def register(spark: SparkSession): Unit = {
    tables(spark).createOrReplaceTempView("information_schema_tables")
    schemata(spark).createOrReplaceTempView("information_schema_schemata")
  }

  /** Pre-parse rewrite: `information_schema.tables` →
    * `information_schema_tables` (and schemata), quote-aware enough for
    * introspection SQL (identifiers never appear inside string literals in
    * the reference's corpus).
    */
  def rewriteInfoSchema(sql: String): String =
    sql.replaceAll("(?i)information_schema\\.(tables|schemata)", "information_schema_$1")

  /** Whether a statement touches the information_schema surface — the
    * SQL entry points re-register the snapshot views first, giving the
    * reference's recompute-per-query semantics (metadata.rs:26-34)
    * without holding a stale snapshot between DDL statements.
    */
  def referencesInfoSchema(sql: String): Boolean =
    java.util.regex.Pattern.compile("(?i)information_schema[._]").matcher(sql).find()
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-level operators (reference: sql/schema/compare_schemas.sql —
  * full-outer join of two schema listings with change classification; the
  * loader's evolve_schema diff is the same computation).
  */
object SchemaOps {

  /** Canonical engine-neutral type name (DuckDB's vocabulary, timestamps
    * collapsed to one family so cross-engine precision variants compare
    * equal). */
  def canonicalTypeName(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case _: TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"${canonicalTypeName(e)}[]"
    case BinaryType => "BLOB"
    case other => other.simpleString.toUpperCase
  }

  /** One row per column: (column_name, column_type). */
  def schemaDf(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.schema.fields.map(f => Row(f.name, canonicalTypeName(f.dataType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField("column_name", StringType, nullable = false),
        StructField("column_type", StringType, nullable = false))))
  }

  /** Full-outer schema diff with change classification
    * (reference compare_schemas.sql:1-24). */
  def compareSchemas(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame = {
    val sa = schemaDf(spark, a).withColumnRenamed("column_type", "type_a")
    val sb = schemaDf(spark, b).withColumnRenamed("column_type", "type_b")
    sa.join(sb, Seq("column_name"), "full_outer")
      .withColumn("change_type",
        when(col("type_a").isNull, lit("added"))
          .when(col("type_b").isNull, lit("removed"))
          .when(col("type_a") =!= col("type_b"), lit("type_changed"))
          .otherwise(lit("unchanged")))
      .select("column_name", "type_a", "type_b", "change_type")
  }
}

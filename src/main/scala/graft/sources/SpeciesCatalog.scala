package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Species catalog source (reference: species_range_etl.py:36-46).
  *
  * The reference fetches a headerless TSV (`speciesList.txt`) over HTTP,
  * names 4 columns, and keeps only the hyphenated name that drives all
  * downstream fan-out. Spark reads the staged file with an explicit
  * schema (never inferSchema on a 100 TB lake — one pass saved).
  */
object SpeciesCatalog {

  val schema: StructType = StructType(Seq(
    StructField("hyphenated_name", StringType),  // etl.py:40
    StructField("common_name", StringType),      // etl.py:41 "regular name"
    StructField("scientific_name", StringType),  // etl.py:42
    StructField("source", StringType)))          // etl.py:43

  /** Full 4-column catalog (O-1). Quote processing disabled: a raw
    * headerless TSV has no quoting convention, and the CSV reader's
    * default '"' handling would swallow tabs after a field that happens
    * to start with a double-quote.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("quote", "").schema(schema).csv(path)

  /** The projection the reference actually uses (O-6,
    * species_range_etl.py:45): only the hyphenated name survives.
    */
  def speciesNames(spark: SparkSession, path: String): DataFrame =
    read(spark, path).select("hyphenated_name")
}

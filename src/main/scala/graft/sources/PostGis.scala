package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** PostGIS-typed load path for the speciesdata sink — closes the O-20 gap
  * noted on `Raster.writeSpeciesDataJdbc` (the reference loads through
  * geopandas `to_postgis`, species_range_etl.py:230-236, which creates a
  * typed `geometry(MultiPolygon, 4326)` column; Spark's stock JDBC writer
  * can only map BinaryType to `bytea`).
  *
  * Spark's JDBC path cannot express a per-column value TRANSFORM in the
  * INSERT (`JdbcDialect.getJDBCType` maps types, not columns, and
  * `JdbcUtils` builds plain `?` placeholders), so a typed geometry load
  * needs its own statements. This object generates them — CREATE TABLE
  * DDL, an `ST_GeomFromWKB(?, srid)` prepared INSERT, and the post-hoc
  * `ALTER TABLE` for data already loaded as bytea — and ships an
  * executor-side batched writer that uses them.
  *
  * No PostGIS server exists in this environment (zero egress), so the live
  * path is UNVERIFIED against a real server; what IS tested offline
  * (RasterSpec): the generated SQL strings themselves, and the batched
  * prepared-statement plumbing end-to-end against embedded Derby with the
  * geometry placeholder swapped to plain `?` (`geomExpr` parameter — the
  * only PostGIS-specific token in the statement).
  */
object PostGis {

  /** Postgres/PostGIS column type for a Spark field; the geometry column
    * gets the typed PostGIS declaration instead of bytea.
    */
  private def pgType(f: StructField, geomCol: String, geomType: String,
                     srid: Int): String =
    if (f.name == geomCol) s"geometry($geomType,$srid)"
    else f.dataType match {
      case LongType                       => "bigint"
      case IntegerType                    => "integer"
      case ShortType                      => "smallint"
      case DoubleType                     => "double precision"
      case FloatType                      => "real"
      case BooleanType                    => "boolean"
      case StringType                     => "text"
      case BinaryType                     => "bytea"
      case DateType                       => "date"
      case TimestampType | TimestampNTZType => "timestamp"
      case d: DecimalType                 => s"numeric(${d.precision},${d.scale})"
      case other =>
        throw new IllegalArgumentException(
          s"no PostGIS mapping for column ${f.name}: $other")
    }

  /** `CREATE TABLE t (sid bigint, …, geometry geometry(MultiPolygon,4326))`. */
  def createTableSql(schema: StructType, table: String, geomCol: String,
                     geomType: String = "MultiPolygon", srid: Int = 4326): String =
    schema.fields
      .map(f => s"${f.name} ${pgType(f, geomCol, geomType, srid)}")
      .mkString(s"CREATE TABLE $table (", ", ", ")")

  /** Prepared INSERT whose geometry placeholder routes the WKB bytes
    * through `geomExpr` (default `ST_GeomFromWKB(?, srid)`); all other
    * columns are plain `?`.
    */
  def insertSql(schema: StructType, table: String, geomCol: String,
                srid: Int = 4326, geomExpr: Option[String] = None): String = {
    val ge = geomExpr.getOrElse(s"ST_GeomFromWKB(?, $srid)")
    val cols = schema.fieldNames.mkString(", ")
    val vals = schema.fields
      .map(f => if (f.name == geomCol) ge else "?").mkString(", ")
    s"INSERT INTO $table ($cols) VALUES ($vals)"
  }

  /** Operational alternative: convert a bytea column already loaded by the
    * generic JDBC path ([[graft.operators.Raster.writeSpeciesDataJdbc]])
    * into the typed geometry column in place.
    */
  def alterToGeometrySql(table: String, geomCol: String,
                         geomType: String = "MultiPolygon",
                         srid: Int = 4326): String =
    s"ALTER TABLE $table ALTER COLUMN $geomCol TYPE geometry($geomType,$srid) " +
      s"USING ST_GeomFromWKB($geomCol, $srid)"

  /** Full-replace batched load with a typed geometry column: DROP/CREATE
    * on the driver, then one connection per partition inserting
    * `batchSize`-row batches through [[insertSql]]'s prepared statement —
    * the executor-parallel analog of the reference's single-connection
    * `to_postgis(chunksize=5)`. `geomExpr` exists so the plumbing is
    * testable against servers without PostGIS (Derby: `Some("?")`).
    *
    * Failure/retry semantics: each partition loads inside ONE transaction
    * (autocommit off, single `commit()` after the last batch), so a task
    * that dies mid-partition rolls back and its retry re-inserts from a
    * clean slate — no partial-partition duplicates. What a bare
    * transaction CANNOT fix is a task that COMMITTED and is then re-run
    * anyway (upstream fetch failure re-running the stage, or a lost
    * task-success message): set `retrySafe = true` and the load becomes
    * idempotent per partition — the table gains a `load_part integer`
    * bookkeeping column (= the task's partition id) and every partition
    * transaction starts with `DELETE … WHERE load_part = pid`, so a
    * re-run replaces its own previous commit instead of duplicating it.
    * The delete rides the same transaction, so a mid-load failure rolls
    * both back. CONCURRENT duplicate attempts (speculative execution)
    * can still interleave delete/insert under READ COMMITTED — keep
    * `spark.speculation=false` (the default) for the load stage either
    * way. Deployers drop `load_part` post-load or read through a view.
    */
  def writeTyped(df0: DataFrame, url: String, table: String, geomCol: String,
                 geomType: String = "MultiPolygon", srid: Int = 4326,
                 batchSize: Int = 10000,
                 geomExpr: Option[String] = None,
                 createTypeOverride: Option[String] = None,
                 retrySafe: Boolean = false): Unit = {
    val df =
      if (retrySafe)
        df0.withColumn("load_part", org.apache.spark.sql.functions.spark_partition_id())
      else df0
    val schema = df.schema
    require(schema.fieldNames.contains(geomCol), s"missing $geomCol")
    val create = createTypeOverride match {
      case Some(t) =>
        schema.fields
          .map(f => s"${f.name} ${if (f.name == geomCol) t
            else pgType(f, "", geomType, srid)}")
          .mkString(s"CREATE TABLE $table (", ", ", ")")
      case None => createTableSql(schema, table, geomCol, geomType, srid)
    }
    val insert = insertSql(schema, table, geomCol, srid, geomExpr)
    // driver: full-replace DDL. The DROP swallows ONLY "table does not
    // exist" (42P01 Postgres / 42Y55 Derby); a permission or lock error
    // must surface HERE, not later as a confusing CREATE failure.
    val c0 = java.sql.DriverManager.getConnection(url)
    try {
      val st = c0.createStatement()
      try st.executeUpdate(s"DROP TABLE $table") catch {
        case e: java.sql.SQLException
          if e.getSQLState == "42P01" || e.getSQLState == "42Y55" =>
      }
      st.executeUpdate(create)
      st.close()
    } finally c0.close()
    val fields = schema.fields
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty)
        loadPartition(url, table, insert, fields,
          if (retrySafe) Some(org.apache.spark.TaskContext.getPartitionId())
          else None,
          rows, batchSize)
    }
  }

  /** One partition's transactional load — factored out of the
    * `foreachPartition` closure so the spec can replay it verbatim, which
    * is how the retry-idempotence guarantee is TESTED (a real Spark task
    * re-run of a committed attempt cannot be forced deterministically in
    * a unit test; calling this twice with the same rows is exactly what
    * that re-run executes).
    *
    * @param deletePart Some(pid) = retry-safe mode: the transaction opens
    *                   with `DELETE … WHERE load_part = pid`, making a
    *                   post-commit re-run replace rather than append
    */
  private[graft] def loadPartition(url: String, table: String, insert: String,
                                   fields: Array[StructField],
                                   deletePart: Option[Int],
                                   rows: Iterator[org.apache.spark.sql.Row],
                                   batchSize: Int): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // one transaction per partition: a mid-partition failure rolls
      // back every batch this task inserted (including the retry-safe
      // delete), so the retry starts clean
      conn.setAutoCommit(false)
      try {
        deletePart.foreach { pid =>
          val st = conn.createStatement()
          try st.executeUpdate(s"DELETE FROM $table WHERE load_part = $pid")
          finally st.close()
        }
        val ps = conn.prepareStatement(insert)
        try {
          var pending = 0
          rows.foreach { r =>
            var i = 0
            while (i < fields.length) {
              val v = r.get(i)
              if (v == null) ps.setObject(i + 1, null)
              else fields(i).dataType match {
                case BinaryType => ps.setBytes(i + 1, v.asInstanceOf[Array[Byte]])
                case _          => ps.setObject(i + 1, v)
              }
              i += 1
            }
            ps.addBatch(); pending += 1
            if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) ps.executeBatch()
        } finally ps.close()
        conn.commit()
      } catch {
        case t: Throwable =>
          try conn.rollback() catch { case _: java.sql.SQLException => }
          throw t
      }
    } finally conn.close()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session, ScalaTest reuses). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // session shared across suites
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", graft.util.Scratch.warehouseDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Run `body` with a reliable checkpoint dir configured (the durable
    * branch of graft.util.Checkpoints), then restore the no-dir state so
    * the shared session's other suites keep the localCheckpoint fast
    * path. SparkContext has no public un-setter, hence the reflective
    * write of its `checkpointDir` var.
    */
  def withCheckpointDir[A](body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    session.sparkContext.setCheckpointDir(dir)
    try body(dir)
    finally {
      val setter = classOf[org.apache.spark.SparkContext].getDeclaredMethods
        .find(_.getName == "checkpointDir_$eq")
        .getOrElse(sys.error("SparkContext.checkpointDir setter not found"))
      setter.setAccessible(true)
      setter.invoke(session.sparkContext, None)
    }
  }
}

package graft.util

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for the session's Hadoop configuration, so task
  * closures that open files through the Hadoop FS API (shapefile sidecar
  * reads, sink writes) see the SAME `spark.hadoop.*` settings — object-store
  * credentials, endpoints, timeouts — as the driver. A bare
  * `new Configuration()` inside a task silently drops all of those (it loads
  * only the classpath defaults), which breaks exactly the HDFS/S3 deployments
  * the sinks claim to support.
  *
  * `Configuration` is a Hadoop `Writable`, not `java.io.Serializable`, hence
  * the manual write/readFields hooks (the same trick Spark uses internally).
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

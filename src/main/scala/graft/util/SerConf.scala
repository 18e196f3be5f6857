package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable wrapper for a Hadoop `Configuration` (which is not
  * `java.io.Serializable`) — the standard pattern for shipping the
  * driver's filesystem configuration to executor-side code that opens
  * files directly (deletion-vector sidecars, footer reads). */
final class SerConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for the whole forked test JVM (Engine.session also
  * exercises the extension injection + function registration paths).
  */
object SparkSpecBase {
  lazy val spark: SparkSession =
    Engine.session(master = "local[4]", shufflePartitions = 4, appName = "graft-test")
}

trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.spark
}

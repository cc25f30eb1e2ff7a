package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Destination
import graft.post.Denormalize
import graft.transform.{Projections, Rules}

/** ETL-pipeline throughput bench at the reference's own scale hint
  * ("2M+ records", `etl/orchestrator.py:1210`): synthesizes mongo-shaped
  * chat data with `spark.range` (deterministic, no test fixtures), then runs
  * the full wide-column path — room rules (uuid5 + re-keyed encryption),
  * the message pipeline (filters → Salsa20→AES migration → uuid5/timeuuid
  * ids → sender resolution), participant rules, and the post-migration
  * denormalization (top-1-per-room over every message + p2p lookup) — and
  * prints one JSON line of stage wall-times and rows/s.
  *
  * `runMain graft.PipelineBench [nMessages]` (default 2,000,000).
  */
object PipelineBench {

  def main(args: Array[String]): Unit = {
    val nMessages = if (args.nonEmpty) args(0).toLong else 2000000L
    val nUsers = math.max(nMessages / 200, 100L)
    val nRooms = math.max(nMessages / 40, 100L)
    val nMembers = nRooms * 2
    val spark = Engine.session(appName = "graft-pipeline-bench")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("graft-pbench").toString

    // mongo-shaped synthetic sources (deterministic; ~20% Salsa20-encrypted
    // payloads exercise the crypto migration on a realistic fraction)
    val encSample = graft.functions.ReEncrypt.encryptSalsa20(
      "mensaje secreto de prueba con algo de texto", Rules.LegacyKey)
    val users = spark.range(nUsers).select(
      concat(lit("u"), col("id")).as("_id"),
      concat(lit("User "), col("id")).as("displayName"),
      concat(lit("( 58 ) 412-"), col("id")).as("phoneNumber"),
      concat(lit("USER"), when(col("id") % 7 === 0, "_ROLE").otherwise("")).as("userType"),
      lit(true).as("isActive"),
      timestamp_micros(lit(1700000000000000L) + col("id")).as("createdAt"))
    val rooms = spark.range(nRooms).select(
      concat(lit("r"), col("id")).as("_id"),
      when(col("id") % 10 === 0, "").otherwise(concat(lit("Room "), col("id"))).as("name"),
      (col("id") % 3 === 0).as("isGroup"),
      (col("id") % 17 === 0).as("isAdmin"),
      timestamp_micros(lit(1700000000000000L) + col("id")).as("createdAt"))
    val messages = spark.range(nMessages).select(
      concat(lit("m"), col("id")).as("_id"),
      // skew: ~2% of rooms receive half the traffic (giant-room shape)
      concat(lit("r"), when(col("id") % 2 === 0, col("id") % (nRooms / 50))
        .otherwise(col("id") % nRooms)).as("room"),
      concat(lit("u"), col("id") % nUsers).as("sender"),
      when(col("id") % 5 === 0, lit(encSample))
        .otherwise(concat(lit("texto plano numero "), col("id"))).as("message"),
      (col("id") % 97 === 0).as("isDeleted"),
      lit(true).as("isActive"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000L).as("createdAt"))
    // two members per room with DISTINCT users (id%nRooms and id%nRooms+1
    // would collapse to one user when nRooms divides nUsers — the p2p pair
    // stage would then emit nothing and bench an empty frame)
    val members = spark.range(nMembers).select(
      concat(lit("b"), col("id")).as("_id"),
      concat(lit("r"), col("id") % nRooms).as("room"),
      concat(lit("u"),
        when(col("id") < nRooms, col("id") % nUsers)
          .otherwise((col("id") * 7 + 1) % nUsers)).as("user"),
      when(col("id") % 11 === 0, "admin").otherwise("member").as("role"),
      timestamp_micros(lit(1700000000000000L)).as("joinedAt"))

    def stage(label: String)(f: => (DataFrame, String)): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val (df, path) = f
      df.write.mode("overwrite").parquet(s"$out/$path")
      val n = spark.read.parquet(s"$out/$path").count()
      (label, (System.nanoTime() - t0) / 1e9, n)
    }

    val cassUsers = graft.operators.Relational.sequentialIds(
      Rules.userRules(Projections.userCassandra(users), Destination.Cassandra),
      "mongo_id", "user_id").cache()
    val userDim = cassUsers.select(col("mongo_id"), col("user_id"))

    val results = Seq(
      stage("users") { (cassUsers, "users") },
      stage("rooms") { (Rules.roomRules(Projections.roomCassandra(rooms)), "room_details") },
      stage("messages") {
        (Rules.messageRules(
          Rules.messageExtractFilter(Projections.messageCassandra(messages)),
          Destination.Cassandra, userDim = Some(userDim)), "messages_by_room")
      },
      stage("participants") {
        (Rules.roomMemberRules(Projections.roomMemberCassandra(members),
          userDim = Some(userDim)), "participants_by_room")
      },
      stage("rooms_by_user") {
        val r = spark.read.parquet(s"$out/room_details")
        val p = spark.read.parquet(s"$out/participants_by_room")
        val m = spark.read.parquet(s"$out/messages_by_room")
        (Denormalize.roomsByUser(p, r, m, cassUsers), "rooms_by_user")
      },
      stage("p2p_lookup") {
        val r = spark.read.parquet(s"$out/room_details")
        val p = spark.read.parquet(s"$out/participants_by_room")
        (Denormalize.p2pLookup(r, p), "p2p_room_by_users")
      })

    val total = results.map(_._2).sum
    val totalRows = results.map(_._3).sum
    val stages = results
      .map { case (l, s, n) => s""""$l":{"sec":$s,"rows":$n}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"pipeline_total","value":$total,"unit":"sec","rows":$totalRows,""" +
      s""""rows_per_sec":${(totalRows / total).toLong},"n_messages":$nMessages,""" +
      s""""stages":$stages}""")
    spark.stop()
  }
}

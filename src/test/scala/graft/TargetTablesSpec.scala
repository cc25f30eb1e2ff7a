package graft

import graft.model.TargetTables
import graft.model.TargetTables._
import graft.transform.{Projections, Rules}

/** Typed facade: stage outputs align to the wide-column contracts and come
  * back as compile-time-checked Datasets.
  */
class TargetTablesSpec extends SparkSpecBase {
  import spark.implicits._

  test("roomRules output types as Dataset[RoomDetails]") {
    val rooms = spark.read.json(Seq(
      """{"_id":"r1","name":"Duo","createdAt":"2024-01-01T00:00:00Z"}""").toDS)
      .withColumn("createdAt",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.col("createdAt")))
    val ds = TargetTables.typed[RoomDetails](
      Rules.roomRules(Projections.roomCassandra(rooms)))
    val r = ds.head()
    assert(r.room_id === graft.functions.Uuid5.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("r1")).toString)
    assert(r.`type` === "p2p")
    assert(r.name === "Duo")
  }

  test("missing Option columns surface as None, extras drop") {
    val ds = TargetTables.typed[P2pRoomByUsers](
      Seq(("u1", "u2", "R1")).toDF("user_id", "other_user_id", "room_id")
        .withColumn("junk", org.apache.spark.sql.functions.lit(1)))
    assert(ds.head() === P2pRoomByUsers("u1", "u2", "R1"))
    assert(!ds.columns.contains("junk"))
    // user_id column absent entirely -> aligned as typed null -> None
    val partial = Seq(("R1", "MEMBER", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        false, false, "b1"))
      .toDF("room_id", "role", "joined_at", "is_muted", "is_partner_blocked", "mongo_id")
    val p = TargetTables.typed[ParticipantByRoom](partial).head()
    assert(p.room_id === "R1")
    assert(p.user_id.isEmpty)
  }

  test("roomsByUser denormalization types as Dataset[RoomsByUser]") {
    import org.apache.spark.sql.functions._
    val rooms = Seq(("R1", "p2p", "Duo", "img")).toDF("room_id", "type", "name", "image")
    val participants = Seq(("R1", 1L, "MEMBER"))
      .toDF("room_id", "user_id", "role")
      .withColumn("joined_at", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("is_muted", lit(false))
    val messages = Seq(("R1", "mid1", "hola", 1L))
      .toDF("room_id", "message_id", "content", "sender_id")
      .withColumn("created_at", to_timestamp(lit("2024-02-01 10:00:00")))
    val users = Seq((1L, "Ana")).toDF("user_id", "name")
    val ds = TargetTables.typed[RoomsByUser](
      graft.post.Denormalize.roomsByUser(participants, rooms, messages, users))
    val r = ds.head()
    assert(r.user_id === Some(1L))
    assert(r.room_name === "Duo")
    assert(r.room_type === "p2p")
    assert(r.last_message_preview === "hola")
    assert(r.last_message_sender_name === "Ana")
    assert(!r.is_pinned)
  }
}

package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

import graft.sink.SchemaAligner

/** Typed contracts for the query-first target tables (SURVEY.md §1.3: typed
  * `Dataset[T]` only at the API boundary — transformation logic stays
  * untyped `DataFrame` because it is field-name driven). Shapes mirror the
  * wide-column DDL (`backups/create_scylla_database.cql:21-129`) and the
  * relational dump.
  */
object TargetTables {

  /** room_details (`create_scylla_database.cql:103-116`). */
  final case class RoomDetails(
      room_id: String, name: String, `type`: String, description: String,
      image: String, add_member: Boolean, edit_group: Boolean,
      send_message: Boolean, join_all_user: Boolean, encryption_data: String,
      mongo_id: String, created_at: Timestamp, updated_at: Timestamp)

  /** messages_by_room (`create_scylla_database.cql:21-46`; clustering
    * `ORDER BY message_id DESC`).
    */
  final case class MessageByRoom(
      room_id: String, message_id: String, content: String,
      content_decrypted: String, `type`: String, sender_id: Option[Long],
      sender_message_id: String, file_url: String, file_name: String,
      file_size: Long, mime_type: String, audio_duration: Int, event: String,
      is_deleted: Boolean, deleted_at: Option[Timestamp], edited: Boolean,
      poll_question: String, poll_is_multiple_options: Boolean,
      mongo_id: String, created_at: Timestamp, updated_at: Timestamp)

  /** participants_by_room (`create_scylla_database.cql:121-129`). */
  final case class ParticipantByRoom(
      room_id: String, user_id: Option[Long], role: String,
      joined_at: Timestamp, is_muted: Boolean, is_partner_blocked: Boolean,
      mongo_id: String)

  /** p2p_room_by_users (`create_scylla_database.cql:137-142`). */
  final case class P2pRoomByUsers(user_id: String, other_user_id: String, room_id: String)

  /** rooms_by_user (`create_scylla_database.cql:51-90`) — the columns the
    * denormalization pipeline populates; the remaining last_message_*
    * columns of the DDL ride along untyped until their sources migrate.
    */
  final case class RoomsByUser(
      user_id: Option[Long], is_pinned: Boolean, last_message_at: Option[Timestamp],
      room_id: String, room_name: String, room_type: String, room_image: String,
      last_message_id: String, last_message_preview: String,
      last_message_sender_id: Option[Long], last_message_sender_name: String,
      is_muted: Boolean, role: String, joined_at: Timestamp)

  /** Align an untyped stage output to a typed contract: missing nullable
    * columns become typed nulls, extras drop, order/types normalize — then
    * the encoder enforces the shape at compile time for consumers.
    */
  def typed[T <: Product: Encoder](df: DataFrame): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    SchemaAligner.align(df, enc.schema).as[T](enc)
  }

  implicit val roomDetailsEnc: Encoder[RoomDetails] = Encoders.product[RoomDetails]
  implicit val messageEnc: Encoder[MessageByRoom] = Encoders.product[MessageByRoom]
  implicit val participantEnc: Encoder[ParticipantByRoom] = Encoders.product[ParticipantByRoom]
  implicit val p2pEnc: Encoder[P2pRoomByUsers] = Encoders.product[P2pRoomByUsers]
  implicit val roomsByUserEnc: Encoder[RoomsByUser] = Encoders.product[RoomsByUser]
}

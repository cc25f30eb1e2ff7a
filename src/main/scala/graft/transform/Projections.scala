package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars
import Shape._

/** The reference's 13 declarative projection maps (SURVEY.md §2.2,
  * `etl/transformers/field_mapper.py:18-354`), one `select` per
  * (entity, destination). Fields the downstream rule stage needs for FK
  * resolution / filtering are kept with a `_tmp_` prefix and dropped by
  * [[Rules]] — mirroring the reference's project-then-transform split.
  *
  * Python `doc.get(a) or doc.get(b)` chains become empty-aware coalesces
  * ([[Shape.orElse]]); `doc.get(k, default)` becomes `coalesce`;
  * `datetime.now()` defaults become `current_timestamp()` (X10).
  */
object Projections {

  private def mongoId(df: DataFrame): Column = opt(df, "_id").cast("string").as("mongo_id")
  private def createdAt(df: DataFrame): Column =
    Scalars.tsOrNow(opt(df, "createdAt", "timestamp")).as("created_at")
  private def updatedAt(df: DataFrame): Column =
    Scalars.tsOrNow(opt(df, "updatedAt", "timestamp")).as("updated_at")

  /** P1 — user → postgres (`field_mapper.py:22-73`). */
  def userPostgres(df: DataFrame): DataFrame = df.select(
    coalesce(nullIfEmpty(opt(df, "uuid")), expr("uuid()")).as("uuid"),
    Scalars.rewriteBucketUrl(orElse(opt(df, "photoURL"), opt(df, "avatar"))).as("avatar"),
    Scalars.rewriteBucketUrl(opt(df, "avatar_thumbnail")).as("avatar_thumbnail"),
    Scalars.rewriteBucketUrl(opt(df, "avatar_low_quality")).as("avatar_low_quality"),
    orElse(opt(df, "phoneNumber"), opt(df, "phone")).as("phone"),
    boolOr(df, "phoneVerified", default = false).as("phone_verified"),
    orElse(opt(df, "displayName"), opt(df, "name")).as("name"),
    orElse(opt(df, "fullName"), opt(df, "displayName"), opt(df, "name")).as("fullName"),
    opt(df, "email").as("email"),
    boolOr(df, "emailVerified", default = false).as("email_verified"),
    orElse(opt(df, "description"), opt(df, "bio")).as("description"),
    opt(df, "ban_until", "timestamp").as("ban_until"),
    opt(df, "ban_at", "timestamp").as("ban_at"),
    opt(df, "removed_at", "timestamp").as("removed_at"),
    orElse(opt(df, "role_user"), opt(df, "role")).as("role_user"),
    lit("COMPLETED").as("profileStatus"), // constant, field_mapper.py:41
    opt(df, "deleted_by", "int").as("deleted_by"),
    opt(df, "deleted_reason").as("deleted_reason"),
    orElse(opt(df, "cedula"), opt(df, "dni")).as("dni"),
    opt(df, "birthDate", "date").as("birthdate"),
    opt(df, "gender").as("gender"),
    socialMedia(df, "x").as("socialmedia_x"),
    socialMedia(df, "instagram").as("socialmedia_instagram"),
    socialMedia(df, "tiktok").as("socialmedia_tiktok"),
    socialMedia(df, "facebook").as("socialmedia_facebook"),
    socialMedia(df, "whatsapp").as("socialmedia_whatsapp"),
    socialMedia(df, "telegram").as("socialmedia_telegram"),
    opt(df, "ban_by", "int").as("ban_by"),
    mongoId(df),
    createdAt(df),
    updatedAt(df),
    // temp fields for the rule stage (FK resolution + anonymization)
    idish(df, "province").as("_tmp_province"),
    idish(df, "municipality").as("_tmp_municipality"),
    idish(df, "parroquia").as("_tmp_parroquia"),
    opt(df, "userType").as("_tmp_role_name"),
    boolOr(df, "isActive", default = true).as("_tmp_is_active")
  )

  /** Nested socialMedia struct access with flat-column fallback
    * (`field_mapper.py:63-68`).
    */
  private def socialMedia(df: DataFrame, field: String): Column =
    if (has(df, "socialMedia")) subField(df, "socialMedia", field)
    else opt(df, s"socialmedia_$field")

  /** P2 — user → cassandra (`field_mapper.py:74-88`): same core, `''`
    * defaults instead of nulls, no dni column.
    */
  def userCassandra(df: DataFrame): DataFrame = df.select(
    coalesce(orElse(opt(df, "displayName"), opt(df, "name")), lit("")).as("name"),
    coalesce(opt(df, "email"), lit("")).as("email"),
    coalesce(orElse(opt(df, "phoneNumber"), opt(df, "phone")), lit("")).as("phone"),
    coalesce(Scalars.rewriteBucketUrl(orElse(opt(df, "photoURL"), opt(df, "avatar"))), lit(""))
      .as("avatar"),
    boolOr(df, "isBot", default = false).as("is_bot"),
    mongoId(df),
    createdAt(df),
    updatedAt(df),
    opt(df, "userType").as("_tmp_role_name"),
    boolOr(df, "isActive", default = true).as("_tmp_is_active")
  )

  /** P3 — room → cassandra room_details (`field_mapper.py:94-114`). */
  def roomCassandra(df: DataFrame): DataFrame = {
    def perm(f: String, default: Boolean): Column =
      coalesce(subField(df, "permissions", f, "boolean"), lit(default))
    df.select(
      coalesce(nullIfEmpty(opt(df, "name")),
        concat(lit("Room "), coalesce(opt(df, "_id"), lit("Unknown")))).as("name"),
      // type derivation `_get_room_type` (field_mapper.py:360-368)
      when(boolOr(df, "isBroadcast", default = false), "broadcast")
        .when(boolOr(df, "isGroup", default = false), "group")
        .otherwise("p2p").as("type"),
      coalesce(opt(df, "description"), lit("")).as("description"),
      coalesce(Scalars.rewriteBucketUrl(orElse(opt(df, "avatar"), opt(df, "photo"))), lit(""))
        .as("image"),
      perm("addMember", default = false).as("add_member"),
      perm("editGroup", default = false).as("edit_group"),
      // canWrite wins over permissions.sendMessage (field_mapper.py:104)
      (if (has(df, "canWrite")) coalesce(opt(df, "canWrite", "boolean"), perm("sendMessage", default = true))
       else perm("sendMessage", default = true)).as("send_message"),
      boolOr(df, "isPublic", default = false).as("join_all_user"),
      coalesce(opt(df, "encryptionData"), lit("")).as("encryption_data"),
      mongoId(df),
      createdAt(df),
      updatedAt(df),
      boolOr(df, "isAdmin", default = false).as("_tmp_is_admin") // F7 organizations branch
    )
  }

  /** P4 — message → cassandra messages_by_room (`field_mapper.py:119-150`). */
  def messageCassandra(df: DataFrame): DataFrame = df.select(
    coalesce(orElse(opt(df, "message"), opt(df, "content")), lit("")).as("content"),
    coalesce(opt(df, "decryptedMessage"), lit("")).as("content_decrypted"),
    coalesce(nullIfEmpty(opt(df, "type")), lit("user_message")).as("type"),
    coalesce(opt(df, "_id"), lit("")).cast("string").as("sender_message_id"),
    coalesce(opt(df, "fileName"), lit("")).as("file_name"),
    coalesce(opt(df, "fileSize", "bigint"), lit(0L)).as("file_size"),
    coalesce(Scalars.rewriteBucketUrl(opt(df, "thumbnail")), lit(""))
      .as("file_thumbnail_url"),
    coalesce(opt(df, "duration", "int"), lit(0)).as("audio_duration"),
    coalesce(opt(df, "event"), lit("")).as("event"),
    boolOr(df, "isDeleted", default = false).as("is_deleted"),
    when(boolOr(df, "isDeleted", default = false), opt(df, "deletedAt", "timestamp"))
      .as("deleted_at"),
    boolOr(df, "edited", default = false).as("edited"),
    coalesce(opt(df, "pollQuestion"), lit("")).as("poll_question"),
    boolOr(df, "pollIsMultiple", default = false).as("poll_is_multiple_options"),
    jsonList(df, "reactions").as("reactions"), // X12, field_mapper.py:449-453
    jsonList(df, "seenBy").as("seen_by"),      // X12, field_mapper.py:455-459
    mongoId(df),
    createdAt(df),
    updatedAt(df),
    idish(df, "room").as("_tmp_room"),
    idish(df, "sender").as("_tmp_sender"),
    orElse(opt(df, "fileURL"), opt(df, "fileUrl")).as("_tmp_file_url"),
    coalesce(opt(df, "fileType"), lit("")).as("_tmp_file_type"),
    boolOr(df, "isActive", default = true).as("_tmp_is_active"),
    opt(df, "msgType").as("_tmp_msg_type"),
    opt(df, "msgLife").as("_tmp_msg_life"),
    idish(df, "replyTo").as("_tmp_reply_to"),
    idish(df, "forwardedFrom").as("_tmp_forwarded_from")
  )

  /** P5 — room_member → participants_by_room (`field_mapper.py:155-167`). */
  def roomMemberCassandra(df: DataFrame): DataFrame = df.select(
    upper(coalesce(nullIfEmpty(opt(df, "role")), lit("member"))).as("role"),
    Scalars.tsOrNow(opt(df, "joinedAt", "timestamp")).as("joined_at"),
    boolOr(df, "isMuted", default = false).as("is_muted"),
    boolOr(df, "isPartnerBlocked", default = false).as("is_partner_blocked"),
    mongoId(df),
    idish(df, "room").as("_tmp_room"),
    idish(df, "user").as("_tmp_user")
  )

  /** P6 — channel → postgres (`field_mapper.py:172-187`). */
  def channelPostgres(df: DataFrame): DataFrame = df.select(
    opt(df, "name").as("name"),
    opt(df, "description").as("description"),
    (if (has(df, "isActive")) coalesce(opt(df, "isActive", "boolean"), lit(true))
     else boolOr(df, "visible", default = true)).as("visible"),
    Scalars.rewriteBucketUrl(urlish(df, "picture")).as("picture"),
    Scalars.rewriteBucketUrl(orElse(urlish(df, "cover"), urlish(df, "coverImage"))).as("cover"),
    (if (has(df, "lives")) coalesce(size(col("lives")), lit(0)) else lit(0)).as("lives"),
    mongoId(df),
    createdAt(df),
    updatedAt(df),
    idish(df, "createdBy").as("_tmp_created_by")
  )

  /** P7 — docs → postgres (`field_mapper.py:192-213`); the onFolder path is
    * resolved by the hierarchical pipeline (J7), so it is carried as a temp.
    */
  def docsPostgres(df: DataFrame): DataFrame = df.select(
    orElse(opt(df, "title"), opt(df, "name"),
      concat(lit("Document "), substring(coalesce(opt(df, "_id"), lit("unknown")), 1, 12)))
      .as("name"),
    coalesce(opt(df, "description"), lit("")).as("description"),
    coalesce(Scalars.rewriteBucketUrl(orElse(urlish(df, "fileUrl"), urlish(df, "fileURL"))),
      lit("")).as("fileURL"),
    boolOr(df, "isVisible", default = true).as("isVisible"),
    boolOr(df, "isPrivate", default = false).as("isPrivate"),
    orElse(opt(df, "fileType"), opt(df, "type"), lit("FILE")).as("type"),
    coalesce(opt(df, "fileSize", "bigint"), opt(df, "size", "bigint"), lit(0L)).as("size"),
    coalesce(opt(df, "ext"), lit("")).as("ext"),
    mongoId(df),
    createdAt(df),
    updatedAt(df),
    opt(df, "onFolder").as("_tmp_on_folder"),
    idish(df, "uploadedBy").as("_tmp_uploaded_by"),
    idish(df, "specialRole").as("_tmp_special_role"),
    boolOr(df, "isActive", default = true).as("_tmp_is_active")
  )

  /** P8 — live → postgres (`field_mapper.py:218-241`); photo url tries five
    * field names in order (`_extract_live_photo_url` `:392-447`).
    */
  def livePostgres(df: DataFrame): DataFrame = df.select(
    coalesce(orElse(opt(df, "title"), opt(df, "name")), lit("")).as("title"),
    coalesce(opt(df, "description"), lit("")).as("description"),
    coalesce(Scalars.rewriteBucketUrl(orElse(
      urlish(df, "photoURL"), urlish(df, "coverImage"), urlish(df, "thumbnail"),
      urlish(df, "cover"), urlish(df, "image"))), lit("")).as("photo_url"),
    when(boolOr(df, "isFinished", default = false), "FINISHED").otherwise("LIVE").as("status"),
    coalesce(orElse(opt(df, "liveUrl"), opt(df, "url"), opt(df, "videoUrl"), opt(df, "link")),
      lit("")).as("live_url"),
    lit("YOUTUBE").as("live_type"), // constant, field_mapper.py:227
    lit(0).as("viewers"),
    when(boolOr(df, "isFeatured", default = false), "FEATURED").otherwise("MORE_TO_SEE")
      .as("category"),
    when(opt(df, "isActive", "boolean") === false, current_timestamp()).as("deleted_at"),
    mongoId(df),
    createdAt(df),
    updatedAt(df),
    idish(df, "createdBy").as("_tmp_created_by"),
    idish(df, "channel").as("_tmp_channel")
  )

  /** P9/P10/P11 — province / municipality / parroquia → postgres
    * (`field_mapper.py:246-304`): shared geo core + per-level FK temps.
    */
  def geoPostgres(df: DataFrame, withProvince: Boolean, withMunicipality: Boolean): DataFrame = {
    val base = Seq(
      opt(df, "name").as("name"),
      orElse(opt(df, "key"), opt(df, "code")).as("key"),
      opt(df, "key_int", "int").as("key_int"),
      boolOr(df, "isActive", default = true).as("is_active"),
      opt(df, "latitude", "decimal(10,8)").as("latitude"),
      opt(df, "longitude", "decimal(11,8)").as("longitude"),
      opt(df, "key_dpt").as("key_dpt"),
      opt(df, "name_alt").as("name_alt"),
      mongoId(df),
      createdAt(df),
      updatedAt(df))
    val fks =
      (if (withProvince) Seq(idish(df, "province").as("_tmp_province")) else Nil) ++
        (if (withMunicipality) Seq(idish(df, "municipality").as("_tmp_municipality")) else Nil)
    df.select(base ++ fks: _*)
  }

  /** P12 — profession / entity → postgres (`field_mapper.py:309-333`):
    * bilingual name coalesce.
    */
  def professionPostgres(df: DataFrame): DataFrame = df.select(
    orElse(opt(df, "name"), opt(df, "name_es"), lit("Unknown")).as("name"),
    orElse(opt(df, "name_es"), opt(df, "name"), lit("Desconocido")).as("name_es"),
    boolOr(df, "isActive", default = true).as("is_active"),
    mongoId(df),
    createdAt(df),
    updatedAt(df))

  def entityPostgres(df: DataFrame): DataFrame = df.select(
    opt(df, "name").as("name"),
    orElse(opt(df, "name_es"), opt(df, "name")).as("name_es"),
    boolOr(df, "isActive", default = true).as("is_active"),
    opt(df, "organization").as("organization"),
    mongoId(df),
    createdAt(df),
    updatedAt(df))

  /** P13 — roles → postgres + cassandra (`field_mapper.py:338-353`). */
  def rolesPostgres(df: DataFrame): DataFrame = df.select(
    opt(df, "name").as("name"),
    coalesce(nullIfEmpty(opt(df, "type")), lit("app")).as("type"),
    boolOr(df, "default", default = false).as("default"),
    mongoId(df),
    createdAt(df),
    updatedAt(df))

  def rolesCassandra(df: DataFrame): DataFrame = df.select(
    coalesce(nullIfEmpty(opt(df, "name")), lit("Unknown Role")).as("name"),
    boolOr(df, "contactsHide", default = false).as("contacts_hide"),
    mongoId(df))
}

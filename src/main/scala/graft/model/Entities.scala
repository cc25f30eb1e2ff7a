package graft.model

/** Destination dialect (the reference's 'postgres' / 'cassandra' split —
  * `etl/config/settings.py` COLLECTION_MAPPINGS `strategy`).
  */
sealed trait Destination
object Destination {
  case object Postgres extends Destination
  case object Cassandra extends Destination
}

sealed trait Strategy {
  def destinations: Seq[Destination]
}
object Strategy {
  case object PostgresOnly extends Strategy {
    val destinations = Seq(Destination.Postgres)
  }
  case object CassandraOnly extends Strategy {
    val destinations = Seq(Destination.Cassandra)
  }
  case object Dual extends Strategy {
    val destinations = Seq(Destination.Postgres, Destination.Cassandra)
  }
}

/** One source collection and its migration contract — mirrors the entries of
  * the reference's COLLECTION_MAPPINGS (`etl/config/settings.py:138-258`):
  * topological `order` (parents before children), per-destination target
  * table names, and the structural flags that route an entity through the
  * special pipelines (hierarchical docs, many-to-many explode, lookup-table
  * emission).
  */
final case class EntityConfig(
    name: String,
    mongo: String,
    order: Int,
    strategy: Strategy,
    postgresTable: Option[String] = None,
    cassandraTable: Option[String] = None,
    isHierarchical: Boolean = false,
    isManyToMany: Boolean = false,
    hasOrganizations: Boolean = false,
    hasMongoLookup: Boolean = false,
    hasP2pLookup: Boolean = false,
    hasRoomLookup: Boolean = false,
    hasMembershipLookup: Boolean = false)

object Entities {
  import Strategy._

  /** The 15 entities in dependency order (`settings.py:136-137`: "Order
    * matters! Parent entities must be migrated before children").
    */
  val all: Seq[EntityConfig] = Seq(
    EntityConfig("roles", "roles", 1, Dual,
      postgresTable = Some("role"), cassandraTable = Some("role")),
    EntityConfig("province", "provinces", 2, PostgresOnly, postgresTable = Some("province")),
    EntityConfig("municipality", "municipalities", 3, PostgresOnly,
      postgresTable = Some("municipality")),
    EntityConfig("parroquia", "parroquias", 4, PostgresOnly, postgresTable = Some("parroquia")),
    EntityConfig("profession", "professions", 5, PostgresOnly,
      postgresTable = Some("profession")),
    EntityConfig("entity", "entities", 6, PostgresOnly, postgresTable = Some("entities")),
    EntityConfig("user", "users", 7, Dual,
      postgresTable = Some("user"), cassandraTable = Some("users")),
    EntityConfig("channel", "channels", 8, PostgresOnly, postgresTable = Some("channel")),
    EntityConfig("docs", "docs", 9, PostgresOnly, postgresTable = Some("docs"),
      isHierarchical = true),
    EntityConfig("live", "lives", 10, PostgresOnly, postgresTable = Some("live")),
    EntityConfig("room", "rooms", 11, CassandraOnly, cassandraTable = Some("room_details"),
      hasOrganizations = true, hasMongoLookup = true, hasP2pLookup = true),
    EntityConfig("message", "messages", 12, CassandraOnly,
      cassandraTable = Some("messages_by_room"), hasRoomLookup = true),
    EntityConfig("room_member", "roommembers", 13, CassandraOnly,
      cassandraTable = Some("participants_by_room"), hasMembershipLookup = true),
    EntityConfig("profession_user", "users", 14, PostgresOnly,
      postgresTable = Some("profession_user"), isManyToMany = true),
    EntityConfig("entities_user", "users", 15, PostgresOnly,
      postgresTable = Some("entities_user"), isManyToMany = true)
  )

  val byName: Map[String, EntityConfig] = all.map(e => e.name -> e).toMap

  /** Topological execution order. */
  def ordered: Seq[EntityConfig] = all.sortBy(_.order)
}

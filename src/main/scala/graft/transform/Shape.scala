package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType, StructType}

/** Shape-tolerant ingest normalization (SURVEY.md §1.3, §7.4 risk 6).
  *
  * The reference re-checks value shapes at every use site — the same field
  * can be an ObjectId, a `{_id: …}` document, a `{url: …}` document, a plain
  * string, `{}`, `[]`, or absent (`field_mapper.py:461-529`). In Spark the
  * schema is known at plan time, so shape tolerance is resolved STATICALLY:
  * these helpers inspect the DataFrame schema once and emit the right
  * column expression, so downstream projections always see clean strings.
  */
object Shape {

  def has(df: DataFrame, name: String): Boolean = df.schema.fieldNames.contains(name)

  /** Column if present, typed null otherwise — the `doc.get(...)` total
    * accessor.
    */
  def opt(df: DataFrame, name: String, dataType: String = "string"): Column =
    if (has(df, name)) col(name) else lit(null).cast(dataType)

  /** A reference id that may be a plain string or a nested `{_id}` document
    * (`field_mapper.py:461-495`); empty strings normalize to null.
    */
  def idish(df: DataFrame, name: String): Column = {
    val c =
      if (!has(df, name)) lit(null).cast(StringType)
      else df.schema(name).dataType match {
        case s: StructType if s.fieldNames.contains("_id") => col(s"$name._id").cast(StringType)
        case _: StructType => lit(null).cast(StringType)
        case _ => col(name).cast(StringType)
      }
    nullIfEmpty(c)
  }

  /** A media value that may be a plain url string or a `{url: …}` document
    * (`field_mapper.py:177-178`, `:497-529`).
    */
  def urlish(df: DataFrame, name: String): Column =
    if (!has(df, name)) lit(null).cast(StringType)
    else df.schema(name).dataType match {
      case s: StructType if s.fieldNames.contains("url") => col(s"$name.url").cast(StringType)
      case _: StructType => lit(null).cast(StringType)
      case _ => col(name).cast(StringType)
    }

  /** Python falsy-string semantics: `'' or fallback` picks the fallback, so
    * the reference's `doc.get(a) or doc.get(b)` chains need empty-aware
    * coalescing, not plain `coalesce`.
    */
  def nullIfEmpty(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  def orElse(cols: Column*): Column = coalesce(cols.map(nullIfEmpty): _*)

  /** `doc.get(name, default)` for booleans. */
  def boolOr(df: DataFrame, name: String, default: Boolean): Column =
    coalesce(opt(df, name, "boolean"), lit(default))

  /** X12 — JSON serialization of a list-valued field (`field_mapper.py:
    * 449-459` `_serialize_reactions` / `_serialize_list`): complex values
    * become their JSON text; an absent field or null value falls back to
    * `"[]"` (the reference's falsy default). Whitespace differs from
    * CPython's `json.dumps` (`", "` separators) — the payload is
    * semantically identical JSON.
    */
  def jsonList(df: DataFrame, name: String): Column =
    if (!has(df, name)) lit("[]")
    else df.schema(name).dataType match {
      case _: ArrayType | _: MapType | _: StructType =>
        coalesce(to_json(col(name)), lit("[]"))
      case _ => coalesce(col(name).cast(StringType), lit("[]"))
    }

  /** A sub-field of a nested document that may itself be absent — the
    * `doc.get('socialMedia', {}).get('x')` double-total accessor
    * (`field_mapper.py:63-68`, `:102-104`). Dynamic JSON schemas only carry
    * the sub-fields that occur somewhere in the data, so presence must be
    * probed per level.
    */
  def subField(df: DataFrame, struct: String, field: String, dataType: String = "string")
      : Column =
    if (!has(df, struct)) lit(null).cast(dataType)
    else df.schema(struct).dataType match {
      case s: StructType if s.fieldNames.contains(field) =>
        col(s"$struct.$field").cast(dataType)
      case _ => lit(null).cast(dataType)
    }
}

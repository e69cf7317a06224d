package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ANSI-safe numeric casts for text-source fields.
  *
  * Every text source here drops its header/comment rows with a filter and
  * then casts fields in the projection — but Catalyst is free to infer
  * new predicates from a downstream join's constraints
  * (InferFiltersFromConstraints) and push them past the projection,
  * where they can evaluate a strict ANSI cast on a header row BEFORE the
  * header filter runs. Observed concretely: composing Sam.read into an
  * overlap join pushed `isnotnull(flag)` below the '@' filter and blew
  * up with CAST_INVALID_INPUT on '@HD VN:1.6'. A digit-guarded cast is
  * null on garbage no matter where the optimizer evaluates it, while
  * staying a plain codegen'd expression (no try/catch, no UDF).
  */
private[sources] object Casts {

  // digit counts are BOUNDED below the target type's max (18 < len
  // of Long.MaxValue, 9 < len of Int.MaxValue): an unbounded digit run
  // like a 20-digit Content-Length would pass a bare [0-9]+ guard and
  // then THROW in the ANSI cast — exactly the failure the guard exists
  // to prevent. Values that large are garbage in every format parsed
  // here, so null is the right answer.
  def tryLong(c: Column): Column =
    when(c.rlike("^-?[0-9]{1,18}$"), c.cast("long"))

  def tryInt(c: Column): Column =
    when(c.rlike("^-?[0-9]{1,9}$"), c.cast("int"))

  def tryDouble(c: Column): Column =
    when(c.rlike("^-?[0-9]*\\.?[0-9]+([eE][-+]?[0-9]+)?$"),
      c.cast("double"))

  // ISO date only (the sitemaps/feeds subset) — anything else nulls
  // instead of throwing in the ANSI cast
  def tryDate(c: Column): Column =
    when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"), c.cast("date"))
}

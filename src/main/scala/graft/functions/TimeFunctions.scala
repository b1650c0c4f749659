package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time helpers mirroring /root/reference/rialto_airflow/utils.py:203-222. */
object TimeFunctions {

  /** days_since: whole days between two instants, flooring toward
    * negative infinity like Python's timedelta.days (NOT calendar-date
    * diff — a 23h59m gap is 0 days).
    */
  def daysBetween(start: Column, end: Column): Column =
    floor((unix_timestamp(end) - unix_timestamp(start)) / 86400L).cast("long")
}

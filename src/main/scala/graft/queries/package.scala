package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver contract: (session, sf-dir) → result frame. */
  type QueryFn = (SparkSession, String) => DataFrame
}

package org.apache.spark.sql.connector.catalog

import org.apache.spark.sql.types.StructType

/** Package-placed accessor for `CatalogV2Util.v2ColumnsToStructType`
  * (which is `private[sql]`): graft's catalog must run Spark's OWN
  * `Column[]` → `StructType` conversion — comments and column
  * DEFAULTs encode through several non-trivial metadata rules that
  * would drift if re-implemented — and then re-attach the one thing
  * that conversion drops (the identity spec; see
  * `GraftCatalog.createTable`). The standard connector shim pattern;
  * no Spark internals are modified. */
object GraftCatalogShims {
  def v2ColumnsToStructType(columns: Array[Column]): StructType =
    CatalogV2Util.v2ColumnsToStructType(columns.toSeq)
}

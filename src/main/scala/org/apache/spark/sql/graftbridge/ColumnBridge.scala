package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the Column ↔ catalyst Expression converters,
  * which are `private[sql]` in Spark 4 (the Connect refactor removed
  * the public `Column(expr)` constructor / `.expr` accessor). This is
  * the supported extension seam for libraries shipping custom
  * Catalyst expressions: conversion only, no other internals touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER conversion of a Column's node tree to a catalyst
    * Expression. `expression` above wraps lazily (the classic Dataset
    * entry points unwrap it during their own node conversion); an
    * expression spliced into a FunctionRegistry builder result never
    * passes through those entry points, so the lazy wrapper would
    * reach codegen unresolved — SQL-function registration of
    * Column-composed functions must use this one. */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, Percentile}
import org.apache.spark.sql.graftbridge.{builtinSqlBuilder, registerSqlFunction}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType, TimestampType}

/** Portable-SQL function surface: registers the DuckDB/Postgres-flavored
  * function names the oracle dialect uses as session-scoped aliases for
  * native Catalyst expressions, so ONE SQL string runs verbatim on both
  * the warehouse oracle (DuckDB) and `spark.sql` over [[Tables]] views.
  *
  * This is the reference's declared analyst surface — ad-hoc SQL against
  * warehouse tables (reference `README.md:21`) — opened up to the full
  * operator inventory: every alias resolves to a codegen'd builtin (or
  * the repo's own [[graft.functions.ArrayDotProduct]]), never a UDF, so
  * the SQL face pays zero overhead versus the DataFrame face.
  *
  * Two names intentionally SHADOW Spark builtins with arity dispatch
  * (session-registry entries win over builtins; Spark semantics are
  * preserved for Spark's own arities):
  *  - `regexp_replace(s, p, r)` stays builtin (Spark replaces ALL
  *    matches); `regexp_replace(s, p, r, 'g')` (DuckDB needs the
  *    explicit global flag for the same semantics) drops the flag.
  *  - `make_timestamp(y,m,d,h,mi,s)` stays builtin; 1-arg micros
  *    (DuckDB) maps to `timestamp_micros`.
  */
object SqlCompat {

  private def lambda2(f: (Expression, Expression) => Expression,
      a: String, b: String): LambdaFunction = {
    val x = UnresolvedNamedLambdaVariable(Seq(a))
    val y = UnresolvedNamedLambdaVariable(Seq(b))
    LambdaFunction(f(x, y), Seq(x, y))
  }
  private def lambda1(f: Expression => Expression, a: String): LambdaFunction = {
    val x = UnresolvedNamedLambdaVariable(Seq(a))
    LambdaFunction(f(x), Seq(x))
  }

  /** DuckDB `string_split` splits on a LITERAL separator while Spark's
    * `split` takes a regex — quote literal separators so metacharacter
    * separators (`.`, `|`) can't silently fan out. */
  private def quoted(sep: Expression): Expression = sep match {
    case Literal(s, StringType) if s != null =>
      Literal(java.util.regex.Pattern.quote(s.toString))
    case other => other
  }

  private def asDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** name → builder table. Kept alphabetical for auditability. */
  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_slice" -> { c =>
      // DuckDB: 1-based inclusive [begin, end], end past length truncates.
      // Spark Slice is (start, length) — length = max(0, end-begin+1);
      // Slice itself truncates past the array end.
      Slice(c(0), c(1),
        Greatest(Seq(Literal(0), Add(Subtract(c(2), c(1)), Literal(1)))))
    },
    "array_to_string" -> { c =>
      ArrayJoin(Cast(c(0), ArrayType(StringType)), c(1), None)
    },
    // NOTE: no `datediff(unit, a, b)` compat is possible — Spark's PARSER
    // special-cases the name and rejects a quoted unit before function
    // resolution runs; day-diff oracles use epoch_us arithmetic instead.
    "epoch_us" -> { c => UnixMicros(Cast(c(0), TimestampType)) },
    "generate_series" -> { c =>
      // inclusive bounds in both engines; Sequence handles date+interval
      if (c.size == 3) new Sequence(c(0), c(1), Some(c(2)))
      else new Sequence(c(0), c(1), None)
    },
    "json_extract_string" -> { c => GetJsonObject(c(0), c(1)) },
    "json_keys" -> { c => JsonObjectKeys(c(0)) },
    "len" -> { c => Size(c(0)) },
    "list" -> { c => CollectList(c(0)) },
    "list_concat" -> { c => Concat(c) },
    "list_contains" -> { c => ArrayContains(c(0), c(1)) },
    "list_distinct" -> { c => ArrayDistinct(c(0)) },
    "list_dot_product" -> { c =>
      graft.functions.ArrayDotProduct(asDoubleArray(c(0)), asDoubleArray(c(1)))
    },
    "list_extract" -> { c => ElementAt(c(0), c(1)) }, // 1-based in both
    "list_filter" -> { c => ArrayFilter(c(0), reshape(c(1))) },
    "list_intersect" -> { c => ArrayIntersect(c(0), c(1)) },
    "list_max" -> { c => ArrayMax(c(0)) },
    "list_min" -> { c => ArrayMin(c(0)) },
    "list_sort" -> { c => new SortArray(c(0), Literal(true)) },
    "list_sum" -> { c =>
      // double fold — exact for the integer sums the oracles take (< 2^53)
      ArrayAggregate(asDoubleArray(c(0)), Literal(0.0),
        lambda2(Add(_, _), "acc", "x"), lambda1(identity, "acc"))
    },
    "list_transform" -> { c => ArrayTransform(c(0), reshape(c(1))) },
    "list_value" -> { c => CreateArray(c) },
    "make_timestamp" -> { c =>
      if (c.size == 1) MicrosToTimestamp(c(0))
      else builtinSqlBuilder("make_timestamp")(c)
    },
    "quantile_cont" -> { c => new Percentile(c(0), c(1)) },
    "regexp_replace" -> { c =>
      // only the DuckDB global flag is intercepted; every other 4-arg
      // form (Spark's own integer `position` arg in particular) and
      // arity delegates to the builtin so the override never narrows
      // Spark's native surface
      if (c.size == 4) c(3) match {
        case Literal(g, StringType) if g != null && g.toString == "g" =>
          RegExpReplace(c(0), c(1), c(2))
        case _ => builtinSqlBuilder("regexp_replace")(c)
      } else builtinSqlBuilder("regexp_replace")(c)
    },
    "string_split" -> { c => StringSplit(c(0), quoted(c(1)), Literal(-1)) },
    "unnest" -> { c => Explode(c(0)) },
    "xor" -> { c => BitwiseXor(c(0), c(1)) }
  )

  /** The parser wraps `x -> ...` lambdas for unknown functions the same
    * way as for builtins, so higher-order children arrive ready-made;
    * this hook exists only to fail fast if a non-lambda slips in. */
  private def reshape(e: Expression): Expression = e match {
    case l: LambdaFunction => l
    case other => throw new IllegalArgumentException(
      s"expected lambda argument, got ${other.getClass.getSimpleName}")
  }

  /** Idempotent per-session registration (createOrReplace semantics). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      registerSqlFunction(spark, name, b)
    }
}

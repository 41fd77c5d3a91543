package graft.plans

import org.apache.spark.sql.catalyst.analysis.{UnresolvedException, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression}
import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}

/** Shared key-shape validation for the two planned CEP operators — ONE
  * definition so their key contracts cannot drift (review r17 pass 2:
  * the block had been pasted verbatim into both builders). */
private[plans] object PlanKeys {

  /** Reject key expressions whose EVALUATED values lack value equality:
    * the physical operators' run-boundary check compares with
    * Objects.equals, which is identity equality for the
    * InternalRow/ArrayData/MapData that struct/array/map keys evaluate
    * to, and for binary's Array[Byte] — a composite key would silently
    * open a new run per row (review r17). A bare `struct(...)` column
    * carries a NamePlaceholder whose dataType throws pre-analysis —
    * that exact shape maps to the same rejection; any OTHER unresolved
    * key rethrows its own UnresolvedException so the real error (an
    * unregistered UDF, a typo'd function) surfaces instead of a
    * misleading composite-key message (review r17 pass 2). */
  def requireValueEqualityKey(keyE: Expression): Unit = {
    val keyType =
      try keyE.dataType
      catch {
        case e: UnresolvedException =>
          // the Column API builds struct(...)/array(...)/map(...) as
          // UnresolvedFunction nodes pre-analysis (probed on this Spark
          // version) — map those composite BUILDERS to the matching
          // rejected type, but ONLY when the builder IS the key's
          // top-level evaluated expression (Alias-unwrapped root): a
          // collectFirst over the whole tree mis-rejected
          // `hash(struct(a, b))` — an atomic int with value equality —
          // because the NESTED struct() matched (ADVICE r17). Any
          // other unresolved key rethrows so the real error (an
          // unregistered UDF, a typo'd function) surfaces
          import org.apache.spark.sql.catalyst.expressions.Alias
          import org.apache.spark.sql.types.NullType
          @annotation.tailrec def root(x: Expression): Expression =
            x match {
              case a: Alias => root(a.child)
              case other => other
            }
          val composite = root(keyE) match {
            case _: CreateNamedStruct => Some(StructType(Nil))
            case f: UnresolvedFunction
                if Set("struct", "named_struct", "array", "map",
                  "create_map").contains(
                  f.nameParts.last.toLowerCase(java.util.Locale.ROOT)) =>
              f.nameParts.last.toLowerCase(java.util.Locale.ROOT) match {
                case "array" => Some(ArrayType(NullType))
                case "map" | "create_map" =>
                  Some(MapType(NullType, NullType))
                case _ => Some(StructType(Nil))
              }
            case _ => None
          }
          composite.getOrElse {
            // a composite builder NESTED under an unresolvable wrapper
            // (coalesce(struct(..), struct(..))) still rethrows the
            // wrapper's own error — root-only mapping cannot tell a
            // composite-typed wrapper from an atomic one like hash() —
            // but the rethrow carries a suppressed hint so the
            // value-equality diagnosis stays discoverable (review r18)
            if (keyE.exists {
                case _: CreateNamedStruct => true
                case f: UnresolvedFunction => Set("struct", "named_struct",
                  "array", "map", "create_map").contains(
                  f.nameParts.last.toLowerCase(java.util.Locale.ROOT))
                case _ => false
              }) {
              e.addSuppressed(new IllegalArgumentException(
                "note: the key contains a struct/array/map builder; if " +
                  "the key EVALUATES to a composite value it has no " +
                  "value equality on the run-boundary check — key on an " +
                  "atomic column (concat composite keys into one " +
                  "string/long)"))
            }
            throw e
          }
      }
    keyType match {
      case _: StructType | _: ArrayType | _: MapType | BinaryType =>
        throw new IllegalArgumentException(
          s"planned CEP key type ${keyType.simpleString} has no " +
            "value equality on the evaluated path; key on an atomic " +
            "column (concat composite keys into one string/long)")
      case _ => ()
    }
  }
}

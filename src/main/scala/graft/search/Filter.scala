package graft.search

import org.apache.spark.sql.functions._
import org.roaringbitmap.RoaringBitmap

import graft.core.Bitmaps
import graft.functions.GeoMath

/** Filter DSL — recursive-descent port of the reference grammar
  * (`/root/reference/filter-parser/src/lib.rs:1-40` BNF) and its evaluation
  * to a candidate bitmap (`/root/reference/milli/src/search/facet/filter.rs:146-390`).
  */
object FilterParser {

  sealed trait Ast
  final case class FAnd(l: Ast, r: Ast) extends Ast
  final case class FOr(l: Ast, r: Ast) extends Ast
  final case class FNot(inner: Ast) extends Ast
  final case class FCond(field: String, op: String, value: String) extends Ast
  final case class FBetween(field: String, lo: String, hi: String) extends Ast
  final case class FExists(field: String) extends Ast
  final case class FIn(field: String, values: Seq[String]) extends Ast
  final case class FGeoRadius(lat: Double, lng: Double, radiusMeters: Double) extends Ast

  def parse(input: String): Ast = new Parser(input).parseExpression(top = true)

  private final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def peekKeyword(kw: String): Boolean = {
      ws()
      s.regionMatches(i, kw, 0, kw.length) &&
        (i + kw.length >= s.length || !isWordChar(s.charAt(i + kw.length)))
    }
    private def eatKeyword(kw: String): Boolean = {
      if (peekKeyword(kw)) { i += kw.length; true } else false
    }
    private def isWordChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.'

    def parseExpression(top: Boolean = false): Ast = {
      val e = parseOr()
      if (top) { ws(); require(i >= s.length, s"trailing input in filter at $i: '${s.drop(i)}'") }
      e
    }
    private def parseOr(): Ast = {
      var left = parseAnd()
      while (eatKeyword("OR")) left = FOr(left, parseAnd())
      left
    }
    private def parseAnd(): Ast = {
      var left = parseNot()
      while (eatKeyword("AND")) left = FAnd(left, parseNot())
      left
    }
    private def parseNot(): Ast =
      if (eatKeyword("NOT")) FNot(parseNot()) else parsePrimary()

    private def parsePrimary(): Ast = {
      ws()
      if (i < s.length && s.charAt(i) == '(') {
        i += 1
        val e = parseExpression()
        ws()
        require(i < s.length && s.charAt(i) == ')', s"expected ) at $i")
        i += 1
        return e
      }
      if (peekKeyword("_geoRadius")) {
        i += "_geoRadius".length
        ws(); require(s.charAt(i) == '('); i += 1
        val nums = parseFloatList(3)
        require(s.charAt(i) == ')'); i += 1
        return FGeoRadius(nums(0), nums(1), nums(2))
      }
      val field = parseValue()
      ws()
      if (eatKeyword("EXISTS")) return FExists(field)
      if (peekKeyword("NOT")) {
        val save = i
        eatKeyword("NOT")
        if (eatKeyword("EXISTS")) return FNot(FExists(field))
        if (eatKeyword("IN")) return FNot(FIn(field, parseValueList()))
        i = save
      }
      if (eatKeyword("IN")) return FIn(field, parseValueList())
      ws()
      val twoCharOps = Seq(">=", "<=", "!=")
      val opOpt: Option[String] =
        twoCharOps.find(o => s.regionMatches(i, o, 0, 2)) match {
          case Some(o) => i += 2; Some(o)
          case None if i < s.length && "=<>".indexOf(s.charAt(i)) >= 0 =>
            i += 1; Some(s.charAt(i - 1).toString)
          case None => None
        }
      opOpt match {
        case Some(op) => FCond(field, op, parseValue())
        case None =>
          // `to` production: field lo TO hi
          val lo = parseValue()
          require(eatKeyword("TO"), s"expected operator or TO at $i in '$s'")
          FBetween(field, lo, parseValue())
      }
    }

    /** `value` production: word | 'quoted' | "quoted". */
    private def parseValue(): String = {
      ws()
      require(i < s.length, "unexpected end of filter")
      s.charAt(i) match {
        case '\'' =>
          val end = s.indexOf('\'', i + 1)
          require(end > 0, "unterminated quote")
          val v = s.substring(i + 1, end); i = end + 1; v
        case '"' =>
          val end = s.indexOf('"', i + 1)
          require(end > 0, "unterminated quote")
          val v = s.substring(i + 1, end); i = end + 1; v
        case _ =>
          val start = i
          while (i < s.length && isWordChar(s.charAt(i))) i += 1
          require(i > start, s"expected value at $start in '$s'")
          s.substring(start, i)
      }
    }

    private def parseValueList(): Seq[String] = {
      ws(); require(s.charAt(i) == '['); i += 1
      val out = Vector.newBuilder[String]
      ws()
      while (i < s.length && s.charAt(i) != ']') {
        out += parseValue()
        ws()
        if (i < s.length && s.charAt(i) == ',') { i += 1; ws() }
      }
      require(i < s.length && s.charAt(i) == ']', "unterminated value list")
      i += 1
      out.result()
    }

    private def parseFloatList(n: Int): Seq[Double] = {
      val out = Vector.newBuilder[Double]
      var k = 0
      while (k < n) {
        ws()
        val start = i
        while (i < s.length && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
        out += s.substring(start, i).toDouble
        ws()
        if (k < n - 1) { require(s.charAt(i) == ','); i += 1 }
        k += 1
      }
      out.result()
    }
  }
}

/** Filter AST → docid bitmap. Each leaf is a pushdown read on the facet
  * tables (equality/range checks both the number and the lowercased string
  * form, `filter.rs:188-290`); NOT complements against `documents_ids`
  * (`filter.rs:300-320`). */
object FilterEvaluator {
  import FilterParser._

  def evaluate(index: GraftIndex, ast: Ast): RoaringBitmap = {
    val spark = index.spark
    import spark.implicits._

    def docidsOf(df: org.apache.spark.sql.DataFrame): RoaringBitmap =
      Bitmaps.fromInts(df.select($"docid").distinct().as[Int].collect())

    def eval(a: Ast): RoaringBitmap = a match {
      case FAnd(l, r) => Bitmaps.and(eval(l), eval(r))
      case FOr(l, r)  => Bitmaps.or(eval(l), eval(r))
      case FNot(inner) => Bitmaps.andNot(index.allDocids, eval(inner))
      case FExists(field) =>
        index.facetExists.where($"field" === field)
          .select($"docids").as[Array[Byte]].collect().headOption
          .map(Bitmaps.cboDeserialize).getOrElse(new RoaringBitmap())
      case FIn(field, values) =>
        values.map(v => eval(FCond(field, "=", v)))
          .foldLeft(new RoaringBitmap())(Bitmaps.or)
      case FGeoRadius(lat, lng, radius) =>
        val pts = index.facetNumbers
          .where($"field" === "_geo.lat" || $"field" === "_geo.lng")
          .groupBy($"docid")
          .pivot($"field", Seq("_geo.lat", "_geo.lng"))
          .agg(first($"value"))
          .as[(Int, Option[Double], Option[Double])].collect()
        Bitmaps.fromInts(pts.collect {
          case (docid, Some(dlat), Some(dlng))
              if GeoMath.haversine(dlat, dlng, lat, lng) <= radius => docid
        })
      case FBetween(field, lo, hi) =>
        (lo.toDoubleOption, hi.toDoubleOption) match {
          case (Some(l), Some(h)) =>
            docidsOf(index.facetNumbers
              .where($"field" === field && $"value" >= l && $"value" <= h))
          case _ => new RoaringBitmap()
        }
      case FCond(field, op, value) =>
        val num = value.toDoubleOption
        val norm = value.trim.toLowerCase
        op match {
          case "=" =>
            val byStr = docidsOf(index.facetStrings
              .where($"field" === field && $"norm" === norm))
            val byNum = num.map(n => docidsOf(index.facetNumbers
              .where($"field" === field && $"value" === n)))
            byNum.map(Bitmaps.or(byStr, _)).getOrElse(byStr)
          case "!=" =>
            // != is the complement over ALL documents, not just faceted ones
            // (filter.rs:195-209)
            Bitmaps.andNot(index.allDocids, eval(FCond(field, "=", value)))
          case ">" | ">=" | "<" | "<=" =>
            num match {
              case Some(n) =>
                val cmp = op match {
                  case ">"  => $"value" > n
                  case ">=" => $"value" >= n
                  case "<"  => $"value" < n
                  case "<=" => $"value" <= n
                }
                docidsOf(index.facetNumbers.where($"field" === field && cmp))
              case None =>
                val cmp = op match {
                  case ">"  => $"norm" > norm
                  case ">=" => $"norm" >= norm
                  case "<"  => $"norm" < norm
                  case "<=" => $"norm" <= norm
                }
                docidsOf(index.facetStrings.where($"field" === field && cmp))
            }
          case other => throw new IllegalArgumentException(s"op $other")
        }
    }
    eval(ast)
  }
}

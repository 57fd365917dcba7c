package graft

import scala.collection.mutable.ListBuffer
import graft.rdf.{BNode, Lit, Term, Uri}

/** Synthetic stand-in for the reference suite's TIGER/Line fixture.
  *
  * The reference's query tests import `data/tiger/TGR06001.nt` (Alameda
  * County census data), which the repo does NOT ship — only the
  * conversion script (`data/tiger/tiger.pl`) and the golden outputs
  * (`tests/query/exemplar/`). This generator inverts the goldens: it
  * reads the exemplar files and emits the smallest graph that makes
  * every TIGER-dependent query produce its golden output —
  * label-keyed street features with the exact golden start points,
  * landmark/water/road features, the two path-join neighborhoods the
  * OPTIONAL tests probe, and per-class padding so the whole-store
  * aggregates (`groupby-count-order*`, `tiger-groupby-class`,
  * `distinct-predicate`) match their golden counts line for line.
  *
  * Scale note: ~165k driver-side triples, built once per suite and
  * cached by RefParity.store — the store itself is a normal bucketed
  * QuadStore, so query plans are the production plans.
  */
object TigerFixture {
  private val V = "http://www.census.gov/tiger/2002/vocab#"
  private val CF = "http://www.census.gov/tiger/2002/CFCC/"
  private val TLID = "http://www.census.gov/tiger/2002/tlid/"
  private val LM = "http://www.census.gov/tiger/2002/landmark/6001/"
  private val FT = "http://www.census.gov/tiger/2002/featid/type/"
  private val FD = "http://www.census.gov/tiger/2002/featid/direction/"
  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val Label = "http://www.w3.org/2000/01/rdf-schema#label"

  /** the tiger-side predicate universe — MUST stay inside the
    * `distinct-predicate` golden's list, and cover every tiger
    * predicate in it */
  private val tigerPreds = Set(
    V + "area", V + "directionPrefix", V + "directionSuffix", V + "end",
    V + "lat", V + "location", V + "long", V + "name", V + "path",
    V + "start", RdfType, Label)

  private val exDir = "/root/reference/tests/query/exemplar"

  private def lines(name: String): List[String] = {
    val src = scala.io.Source.fromFile(s"$exDir/$name", "UTF-8")
    try src.getLines().toList finally src.close()
  }
  private def unq(s: String): String = s.stripPrefix("\"").stripSuffix("\"")
  private def unuri(s: String): String = s.stripPrefix("<").stripSuffix(">")

  /** (class URI -> solution count) from a two-column golden */
  private def countsOf(name: String): Map[String, Long] =
    lines(name).filterNot(l => l.startsWith("?") || l.isEmpty).map { l =>
      val c = l.split("\t")
      unuri(c(0)) -> c(1).toLong
    }.toMap

  def triples(swhTypeCounts: Map[String, Long]): List[(Term, Term, Term)] = {
    val out = ListBuffer[(Term, Term, Term)]()
    var n = 0
    def bn(p: String): Term = { n += 1; BNode(s"tg${p}$n") }
    def add(s: Term, p: String, o: Term): Unit = {
      require(tigerPreds(p), s"predicate outside golden universe: $p")
      out += ((s, Uri(p), o))
    }

    // ---- label-keyed street features (start points from the goldens)
    def street(label: String, exemplar: String, tlidBase: Long): Unit = {
      val pts = lines(exemplar).filter(_.startsWith("\"")).map { l =>
        val c = l.split("\t"); (unq(c(0)), unq(c(1))) // (lat, long)
      }.distinct
      val place = bn("pl")
      add(place, Label, Lit(label))
      pts.zipWithIndex.foreach { case ((lat, long), i) =>
        val path = Uri(TLID + (tlidBase + i))
        val st = bn("st")
        add(place, V + "path", path)
        add(path, V + "start", st)
        add(st, V + "lat", Lit(lat))
        add(st, V + "long", Lit(long))
      }
    }
    street("Broadway", "tiger-broadway", 900000000L)
    street("Sugar Hill Terrance West", "tiger-sugar-hill", 900001000L)
    street("Harold Ave", "tiger-harold-ave", 900002000L)

    // ---- tiger-typical: tlid 125011954 with its two next-segment
    // neighbors joining at the end point (golden start/end coords)
    locally {
      val place = bn("pl")
      add(place, Label, Lit("San Leandro Blvd"))
      val path = Uri(TLID + "125011954")
      add(place, V + "path", path)
      val st = bn("st"); val en = bn("en")
      add(path, V + "start", st); add(path, V + "end", en)
      add(st, V + "lat", Lit("37.725629")); add(st, V + "long", Lit("-122.162777"))
      add(en, V + "lat", Lit("37.723429")); add(en, V + "long", Lit("-122.161176"))
      for (next <- Seq("125011970", "125011969")) {
        val j = bn("jn")
        add(j, V + "lat", Lit("37.723429")); add(j, V + "long", Lit("-122.161176"))
        add(Uri(TLID + next), V + "start", j)
      }
    }

    // ---- tiger-fail-optional / tiger-mixed-optional: tlid 125030028's
    // unlabeled end point, joined by two next segments
    locally {
      val path = Uri(TLID + "125030028")
      val en = bn("en")
      add(path, V + "end", en)
      add(en, V + "lat", Lit("37.561035")); add(en, V + "long", Lit("-121.980571"))
      for (next <- Seq("125029998", "125030027")) {
        val j = bn("jn")
        add(j, V + "lat", Lit("37.561035")); add(j, V + "long", Lit("-121.980571"))
        add(Uri(TLID + next), V + "start", j)
      }
    }

    // ---- tiger-water-names: H12 (stream) paths with labeled places
    val waterNames = lines("tiger-water-names")
      .filter(_.startsWith("BNODE")).map(l => unq(l.split("\t")(1)))
    waterNames.foreach { name =>
      val place = bn("wp"); val path = bn("wl")
      add(path, RdfType, Uri(CF + "H12"))
      add(place, V + "path", path)
      add(place, Label, Lit(name))
    }

    // ---- tiger-landmarks: named Landmark URIs, some with a location
    lines("tiger-landmarks").filter(_.startsWith("<")).foreach { l =>
      val c = l.split("\t", -1)
      val lm = Uri(unuri(c(0)))
      add(lm, V + "name", Lit(unq(c(1))))
      add(lm, RdfType, Uri(V + "Landmark"))
      if (c.length > 3 && c(2).nonEmpty) {
        val loc = bn("lo")
        add(lm, V + "location", loc)
        add(loc, V + "lat", Lit(unq(c(2))))
        add(loc, V + "long", Lit(unq(c(3))))
      }
    }

    // ---- null-optional: landmark 821 has an area polygon (with no
    // further properties, so the <this:doesNotExist> join stays empty)
    add(Uri(LM + "821"), V + "area", bn("poly"))

    // ---- tiger-reverse: 13 westward roads (golden shows 13 bnodes)
    val nReverse = lines("tiger-reverse").count(_.startsWith("_:"))
    (1 to nReverse).foreach { i =>
      val r = bn("rd")
      add(r, RdfType, Uri(FT + "Rd"))
      add(r, V + "directionPrefix", Uri(FD + "W"))
      if (i == 1) add(r, V + "directionSuffix", Uri(FD + "SW"))
    }

    // ---- tiger-explosion: two features named+labeled the same
    (1 to 2).foreach { _ =>
      val f = bn("ch")
      add(f, V + "name", Lit("Corral Hollow Creek"))
      add(f, Label, Lit("Corral Hollow Creek"))
    }

    // ---- optimiser-disjunction / union-nobind: Escobar St x2, Smith St
    (1 to 2).foreach(_ => add(bn("es"), Label, Lit("Escobar St")))
    add(bn("sm"), Label, Lit("Smith St"))

    // ---- the `count` script expects 7 x plain "Harris" store-wide;
    // swh contributes 1 (family_name), TIGER the other 6 (street names)
    (1 to 6).foreach(_ => add(bn("ha"), V + "name", Lit("Harris")))

    // ---- select-bnodes: the specific bnode the script addresses via
    // the reference's `<bnode:...>` IRI syntax
    locally {
      val b = BNode("b1eed0100000000f8")
      add(b, V + "lat", Lit("37.648235"))
      add(b, V + "long", Lit("-122.072573"))
    }

    // ---- per-class type padding to the whole-store golden counts
    // (groupby-count-order1 = solutions of `?s a ?o` per ?o over
    // swh+tiger; pad = golden - swh - structural)
    val typeTotals = countsOf("groupby-count-order1")
    val structuralTypes: Map[String, Long] = out.toList.collect {
      case (_, Uri(RdfType), Uri(c)) => c
    }.groupBy(identity[String]).map { case (k, v) => k -> v.size.toLong }
    // typed-instance pools per class (for reference padding below)
    val pool = scala.collection.mutable.Map[String, List[Term]]()
    out.toList.foreach {
      case (s, Uri(RdfType), Uri(c)) =>
        pool(c) = s :: pool.getOrElse(c, Nil)
      case _ => ()
    }
    // every structurally-typed class must be in the golden list, or the
    // groupby queries would emit rows the golden lacks
    require(structuralTypes.keySet.subsetOf(typeTotals.keySet),
      s"classes outside golden: ${structuralTypes.keySet -- typeTotals.keySet}")
    typeTotals.foreach { case (cls, total) =>
      val fromSwh = swhTypeCounts.getOrElse(cls, 0L)
      val structural = structuralTypes.getOrElse(cls, 0L)
      if (!cls.startsWith("http://www.census.gov/")) {
        require(fromSwh == total,
          s"non-tiger class $cls: swh has $fromSwh, golden wants $total")
      } else {
        val pad = total - fromSwh - structural
        require(pad >= 0, s"class $cls over-populated: $total < " +
          s"$fromSwh + $structural")
        (1L to pad).foreach { _ =>
          val inst = bn("ty")
          add(inst, RdfType, Uri(cls))
          pool(cls) = inst :: pool.getOrElse(cls, Nil)
        }
      }
    }

    // ---- reference padding (tiger-groupby-class: solutions of
    // `?s ?p ?x . ?x a ?class` per class)
    val refTotals = countsOf("tiger-groupby-class")
    val typedOf: Map[Term, List[String]] = out.toList.collect {
      case (s, Uri(RdfType), Uri(c)) => (s, c) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // exactly `?s ?p ?x . ?x a ?class` — p unrestricted, one solution
    // per (triple, class-of-x)
    val structuralRefs: Map[String, Long] = out.toList
      .flatMap { case (_, _, o) => typedOf.getOrElse(o, Nil) }
      .groupBy(identity[String]).map { case (k, v) => k -> v.size.toLong }
    require(structuralRefs.keySet.subsetOf(refTotals.keySet),
      s"ref classes outside golden: ${structuralRefs.keySet -- refTotals.keySet}")
    refTotals.foreach { case (cls, total) =>
      val structural = structuralRefs.getOrElse(cls, 0L)
      val pad = total - structural
      require(pad >= 0, s"class $cls refs over-populated")
      val targets = pool.getOrElse(cls, Nil).toVector
      require(targets.nonEmpty || pad == 0, s"no instances of $cls to cite")
      (0L until pad).foreach { i =>
        add(bn("rf"), V + "path", targets((i % targets.size).toInt))
      }
    }

    // ---- global consistency audits
    val coordOwners = out.toList.collect {
      case (s, Uri(p), Lit(v, _, _)) if p == V + "lat" || p == V + "long" =>
        (s, Uri(p): Term, v) }
      .groupBy(_._1).map { case (s, ps) =>
        s -> ps.map(p => p._2 -> p._3).toMap }
    // the two OPTIONAL-join coordinate pairs must belong ONLY to the
    // intended nodes (2 joins + 1 end each), or the join queries grow rows
    for ((lat, long, want) <- Seq(("37.723429", "-122.161176", 3),
                                  ("37.561035", "-121.980571", 3))) {
      val owners = coordOwners.count { case (_, m) =>
        m.get(Uri(V + "lat")).contains(lat) &&
          m.get(Uri(V + "long")).contains(long) }
      require(owners == want, s"join pair ($lat,$long): $owners owners")
    }
    out.toList
  }
}

package graft.rdf

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** RDF/XML reader (the reference's primary import syntax — its importer
  * auto-detects RDF/XML via Raptor, `src/frontend/import.c:333-423`).
  *
  * Covers the RDF/XML subset the reference's own test corpus uses
  * (`/root/reference/data/swh.xrdf`, `tiger` rdfs): node elements
  * (`rdf:Description` and typed), `rdf:about`/`rdf:ID`/`rdf:nodeID`/
  * `rdf:resource`, `rdf:datatype`, property attributes, nested node
  * elements, `xml:lang` inheritance, relative-URI resolution against a
  * base. Parsing is a single sequential stream (StAX) — inherently
  * serial, like the reference's Raptor pass; the DISTRIBUTED import path
  * is N-Triples/N-Quads ([[QuadStore.fromNTriples]]). Convert once,
  * ingest in parallel.
  */
object RdfXml {
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"

  def parseFile(path: String, baseUri: String, scope: String = "")
      : List[(Term, Term, Term)] = {
    val in = new java.io.FileInputStream(path)
    // uniform fail-closed contract with the Turtle/SPARQL parsers: a
    // malformed document rejects with IllegalArgumentException, never a
    // raw StAX exception. (Depth DoS is handled by the JDK reader's own
    // 1000-element limit — verified by fuzzing; DTD + external entities
    // are disabled below against XXE.)
    // scope: document-scoped bnode labels, see [[Turtle.scopeFor]]
    try {
      val ts = parse(in, baseUri)
      if (scope.isEmpty) ts
      else ts.map { case (s, p, o) =>
        def f(t: Term): Term = t match {
          case BNode(b) => BNode(Turtle.scopeLabel(b, scope))
          case other => other
        }
        (f(s), f(p), f(o))
      }
    }
    catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new IllegalArgumentException(
          s"RDF/XML parse error: ${e.getMessage}")
    }
    finally in.close()
  }

  def parse(in: java.io.InputStream,
            baseUri: String): List[(Term, Term, Term)] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(in)
    val out = List.newBuilder[(Term, Term, Term)]
    var bn = 0L
    def freshBNode(): BNode = { bn += 1; BNode(s"genid$bn") }

    def resolve(u: String): String = Iri.resolve(baseUri, u)

    def nsOf: String = Option(r.getNamespaceURI).getOrElse("")

    /** cursor on a node element's START; consumes through its END;
      * returns the node's subject term. */
    def parseNode(lang0: String): Term = {
      val ns = nsOf
      val ln = r.getLocalName
      var subj: Term = null
      var lang = lang0
      val propAttrs = List.newBuilder[(String, String)]
      for (i <- 0 until r.getAttributeCount) {
        val ans = Option(r.getAttributeNamespace(i)).getOrElse("")
        val aln = r.getAttributeLocalName(i)
        val v = r.getAttributeValue(i)
        (ans, aln) match {
          case (Rdf.ns, "about")  => subj = Uri(resolve(v))
          case (Rdf.ns, "ID")     => subj = Uri(resolve("#" + v))
          case (Rdf.ns, "nodeID") => subj = BNode(v)
          case (XmlNs, "lang")    => lang = v
          case (Rdf.ns, _)        => // other rdf:* control attrs ignored
          case ("", _)            => // non-namespaced attrs ignored
          case _                  => propAttrs += ((ans + aln, v))
        }
      }
      if (subj == null) subj = freshBNode()
      if (!(ns == Rdf.ns && ln == "Description"))
        out += ((subj, Uri(Rdf.typ), Uri(ns + ln)))
      propAttrs.result().foreach { case (p, v) =>
        out += ((subj, Uri(p), Lit(v, lang = lang.toLowerCase)))
      }
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => parseProperty(subj, lang)
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
      subj
    }

    /** cursor on a property element's START; consumes through its END. */
    def parseProperty(subj: Term, lang0: String): Unit = {
      val pred = Uri(nsOf + r.getLocalName)
      var lang = lang0
      var obj: Term = null
      var dt: String = null
      for (i <- 0 until r.getAttributeCount) {
        val ans = Option(r.getAttributeNamespace(i)).getOrElse("")
        val aln = r.getAttributeLocalName(i)
        val v = r.getAttributeValue(i)
        (ans, aln) match {
          case (Rdf.ns, "resource") => obj = Uri(resolve(v))
          case (Rdf.ns, "nodeID")   => obj = BNode(v)
          case (Rdf.ns, "datatype") => dt = v
          case (XmlNs, "lang")      => lang = v
          case _                    => ()
        }
      }
      val text = new StringBuilder
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            obj = parseNode(lang) // nested node element = resource object
          case XMLStreamConstants.CHARACTERS |
               XMLStreamConstants.CDATA => text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
      if (obj == null)
        obj =
          if (dt != null) Lit(text.toString,
            dt = if (dt == Xsd.string) "" else dt)
          else Lit(text.toString, lang = lang.toLowerCase)
      out += ((subj, pred, obj))
    }

    // document level: find rdf:RDF, parse its node-element children
    var rdfLang = ""
    try {
      var inRdf = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (!inRdf) {
              if (nsOf == Rdf.ns && r.getLocalName == "RDF") {
                inRdf = true
                for (i <- 0 until r.getAttributeCount)
                  if (Option(r.getAttributeNamespace(i)).contains(XmlNs) &&
                      r.getAttributeLocalName(i) == "lang")
                    rdfLang = r.getAttributeValue(i)
              } else { // document with a single top-level node element
                inRdf = true
                parseNode(rdfLang)
              }
            } else parseNode(rdfLang)
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }
}

package graft.sources

/** Simple-font encoding machinery for pre-Type0 PDFs (ISO 32000-1
  * §9.6.6 + Appendix D, public spec data): the three named base
  * encodings — Standard, WinAnsi, MacRoman — as code → glyph-name
  * tables, the Adobe Glyph List subset resolving every glyph name those
  * tables use, and the AGL `uniXXXX`/`uXXXX` fallback. A simple font's
  * byte codes decode as: /Differences override, else base-encoding
  * table, then glyph name → Unicode. This is the single most common
  * legacy-PDF text shape the reference's loader path (PyMuPDF /
  * PyPDFLoader, app.py:123-132, app.py:169) handles; unknown encodings
  * and unmapped codes throw — silently partial text would corrupt the
  * corpus. */
private[graft] object PdfEncodings {

  /** AGL subset: every glyph name appearing in the three Appendix D
    * tables (which is also the vocabulary real /Differences arrays draw
    * from). Values are the mapped Unicode strings — single code points
    * except the fi/fl ligatures. */
  val glyphToUnicode: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    def g(name: String, cp: Int): Unit = b += name -> new String(Character.toChars(cp))
    // ASCII block (codes 0x20-0x7E share names across all three tables,
    // modulo the 0x27/0x60 Standard quirks mapped below)
    g("space", 0x20); g("exclam", 0x21); g("quotedbl", 0x22); g("numbersign", 0x23)
    g("dollar", 0x24); g("percent", 0x25); g("ampersand", 0x26); g("quotesingle", 0x27)
    g("parenleft", 0x28); g("parenright", 0x29); g("asterisk", 0x2A); g("plus", 0x2B)
    g("comma", 0x2C); g("hyphen", 0x2D); g("period", 0x2E); g("slash", 0x2F)
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine")
    digits.zipWithIndex.foreach { case (n, i) => g(n, 0x30 + i) }
    g("colon", 0x3A); g("semicolon", 0x3B); g("less", 0x3C); g("equal", 0x3D)
    g("greater", 0x3E); g("question", 0x3F); g("at", 0x40)
    ('A' to 'Z').foreach(c => g(c.toString, c.toInt))
    g("bracketleft", 0x5B); g("backslash", 0x5C); g("bracketright", 0x5D)
    g("asciicircum", 0x5E); g("underscore", 0x5F); g("grave", 0x60)
    ('a' to 'z').foreach(c => g(c.toString, c.toInt))
    g("braceleft", 0x7B); g("bar", 0x7C); g("braceright", 0x7D); g("asciitilde", 0x7E)
    // punctuation / typography
    g("quoteright", 0x2019); g("quoteleft", 0x2018); g("quotesinglbase", 0x201A)
    g("quotedblleft", 0x201C); g("quotedblright", 0x201D); g("quotedblbase", 0x201E)
    g("dagger", 0x2020); g("daggerdbl", 0x2021); g("bullet", 0x2022)
    g("ellipsis", 0x2026); g("perthousand", 0x2030); g("guilsinglleft", 0x2039)
    g("guilsinglright", 0x203A); g("guillemotleft", 0xAB); g("guillemotright", 0xBB)
    g("endash", 0x2013); g("emdash", 0x2014); g("trademark", 0x2122)
    g("fi", 0xFB01); g("fl", 0xFB02); g("fraction", 0x2044); g("florin", 0x0192)
    g("circumflex", 0x02C6); g("tilde", 0x02DC); g("caron", 0x02C7)
    g("breve", 0x02D8); g("dotaccent", 0x02D9); g("dieresis", 0xA8)
    g("ring", 0x02DA); g("cedilla", 0xB8); g("hungarumlaut", 0x02DD)
    g("ogonek", 0x02DB); g("macron", 0xAF); g("acute", 0xB4)
    g("Euro", 0x20AC); g("Scaron", 0x0160); g("scaron", 0x0161)
    g("Zcaron", 0x017D); g("zcaron", 0x017E); g("OE", 0x0152); g("oe", 0x0153)
    g("Ydieresis", 0x0178); g("dotlessi", 0x0131); g("Lslash", 0x0141)
    g("lslash", 0x0142); g("minus", 0x2212); g("degree", 0xB0)
    // Latin-1 supplement names (WinAnsi 0xA1-0xFF, Standard/Mac spares)
    g("exclamdown", 0xA1); g("cent", 0xA2); g("sterling", 0xA3)
    g("currency", 0xA4); g("yen", 0xA5); g("brokenbar", 0xA6); g("section", 0xA7)
    g("copyright", 0xA9); g("ordfeminine", 0xAA); g("logicalnot", 0xAC)
    g("registered", 0xAE); g("plusminus", 0xB1); g("twosuperior", 0xB2)
    g("threesuperior", 0xB3); g("mu", 0xB5); g("paragraph", 0xB6)
    g("periodcentered", 0xB7); g("onesuperior", 0xB9); g("ordmasculine", 0xBA)
    g("onequarter", 0xBC); g("onehalf", 0xBD); g("threequarters", 0xBE)
    g("questiondown", 0xBF)
    g("Agrave", 0xC0); g("Aacute", 0xC1); g("Acircumflex", 0xC2); g("Atilde", 0xC3)
    g("Adieresis", 0xC4); g("Aring", 0xC5); g("AE", 0xC6); g("Ccedilla", 0xC7)
    g("Egrave", 0xC8); g("Eacute", 0xC9); g("Ecircumflex", 0xCA); g("Edieresis", 0xCB)
    g("Igrave", 0xCC); g("Iacute", 0xCD); g("Icircumflex", 0xCE); g("Idieresis", 0xCF)
    g("Eth", 0xD0); g("Ntilde", 0xD1); g("Ograve", 0xD2); g("Oacute", 0xD3)
    g("Ocircumflex", 0xD4); g("Otilde", 0xD5); g("Odieresis", 0xD6); g("multiply", 0xD7)
    g("Oslash", 0xD8); g("Ugrave", 0xD9); g("Uacute", 0xDA); g("Ucircumflex", 0xDB)
    g("Udieresis", 0xDC); g("Yacute", 0xDD); g("Thorn", 0xDE); g("germandbls", 0xDF)
    g("agrave", 0xE0); g("aacute", 0xE1); g("acircumflex", 0xE2); g("atilde", 0xE3)
    g("adieresis", 0xE4); g("aring", 0xE5); g("ae", 0xE6); g("ccedilla", 0xE7)
    g("egrave", 0xE8); g("eacute", 0xE9); g("ecircumflex", 0xEA); g("edieresis", 0xEB)
    g("igrave", 0xEC); g("iacute", 0xED); g("icircumflex", 0xEE); g("idieresis", 0xEF)
    g("eth", 0xF0); g("ntilde", 0xF1); g("ograve", 0xF2); g("oacute", 0xF3)
    g("ocircumflex", 0xF4); g("otilde", 0xF5); g("odieresis", 0xF6); g("divide", 0xF7)
    g("oslash", 0xF8); g("ugrave", 0xF9); g("uacute", 0xFA); g("ucircumflex", 0xFB)
    g("udieresis", 0xFC); g("yacute", 0xFD); g("thorn", 0xFE); g("ydieresis", 0xFF)
    b.result()
  }

  /** Glyph name → Unicode, honoring the AGL algorithm's `uniXXXX` /
    * `uXXXX[XX]` fallbacks; unknown names throw. */
  def glyph(name: String): String =
    glyphToUnicode.getOrElse(name, {
      val hex =
        if (name.startsWith("uni") && name.length == 7) name.substring(3)
        else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
          name.substring(1) // uXXXX / uXXXXX / uXXXXXX (AGL §3)
        else null
      require(hex != null && hex.forall(c => Character.digit(c, 16) >= 0),
        s"corrupt PDF: unknown glyph name /$name")
      new String(Character.toChars(Integer.parseInt(hex, 16)))
    })

  /** Encoder helper: the glyph name showing a given char (inverse of the
    * AGL subset; ambiguity resolved toward the WinAnsi-conventional name). */
  lazy val unicodeToGlyph: Map[String, String] = {
    val preferred = Map("'" -> "quotesingle", "`" -> "grave", " " -> "space")
    glyphToUnicode.toSeq.groupBy(_._2).map { case (u, names) =>
      u -> preferred.getOrElse(u, names.map(_._1).min)
    }
  }

  // ---- Appendix D base tables (code → glyph name) --------------------------

  private val asciiCommon: Map[Int, String] = {
    val b = Map.newBuilder[Int, String]
    val punct = Seq(0x20 -> "space", 0x21 -> "exclam", 0x22 -> "quotedbl",
      0x23 -> "numbersign", 0x24 -> "dollar", 0x25 -> "percent",
      0x26 -> "ampersand", 0x28 -> "parenleft", 0x29 -> "parenright",
      0x2A -> "asterisk", 0x2B -> "plus", 0x2C -> "comma", 0x2D -> "hyphen",
      0x2E -> "period", 0x2F -> "slash", 0x3A -> "colon", 0x3B -> "semicolon",
      0x3C -> "less", 0x3D -> "equal", 0x3E -> "greater", 0x3F -> "question",
      0x40 -> "at", 0x5B -> "bracketleft", 0x5C -> "backslash",
      0x5D -> "bracketright", 0x5E -> "asciicircum", 0x5F -> "underscore",
      0x7B -> "braceleft", 0x7C -> "bar", 0x7D -> "braceright",
      0x7E -> "asciitilde")
    b ++= punct
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine")
    digits.zipWithIndex.foreach { case (n, i) => b += (0x30 + i) -> n }
    ('A' to 'Z').foreach(c => b += c.toInt -> c.toString)
    ('a' to 'z').foreach(c => b += c.toInt -> c.toString)
    b.result()
  }

  /** StandardEncoding (Appendix D): ASCII with the 0x27→quoteright /
    * 0x60→quoteleft quirks, plus the Adobe symbol upper half. */
  val standard: Map[Int, String] = asciiCommon ++ Map(
    0x27 -> "quoteright", 0x60 -> "quoteleft",
    0xA1 -> "exclamdown", 0xA2 -> "cent", 0xA3 -> "sterling",
    0xA4 -> "fraction", 0xA5 -> "yen", 0xA6 -> "florin", 0xA7 -> "section",
    0xA8 -> "currency", 0xA9 -> "quotesingle", 0xAA -> "quotedblleft",
    0xAB -> "guillemotleft", 0xAC -> "guilsinglleft", 0xAD -> "guilsinglright",
    0xAE -> "fi", 0xAF -> "fl", 0xB1 -> "endash", 0xB2 -> "dagger",
    0xB3 -> "daggerdbl", 0xB4 -> "periodcentered", 0xB6 -> "paragraph",
    0xB7 -> "bullet", 0xB8 -> "quotesinglbase", 0xB9 -> "quotedblbase",
    0xBA -> "quotedblright", 0xBB -> "guillemotright", 0xBC -> "ellipsis",
    0xBD -> "perthousand", 0xBF -> "questiondown", 0xC1 -> "grave",
    0xC2 -> "acute", 0xC3 -> "circumflex", 0xC4 -> "tilde", 0xC5 -> "macron",
    0xC6 -> "breve", 0xC7 -> "dotaccent", 0xC8 -> "dieresis", 0xCA -> "ring",
    0xCB -> "cedilla", 0xCD -> "hungarumlaut", 0xCE -> "ogonek", 0xCF -> "caron",
    0xD0 -> "emdash", 0xE1 -> "AE", 0xE3 -> "ordfeminine", 0xE8 -> "Lslash",
    0xE9 -> "Oslash", 0xEA -> "OE", 0xEB -> "ordmasculine", 0xF1 -> "ae",
    0xF5 -> "dotlessi", 0xF8 -> "lslash", 0xF9 -> "oslash", 0xFA -> "oe",
    0xFB -> "germandbls")

  /** WinAnsiEncoding (Appendix D ≈ CP1252): ASCII with quotesingle/grave,
    * the 0x80-0x9F Windows block, Latin-1 names above 0xA0. */
  val winAnsi: Map[Int, String] = {
    val high = Map(
      0x80 -> "Euro", 0x82 -> "quotesinglbase", 0x83 -> "florin",
      0x84 -> "quotedblbase", 0x85 -> "ellipsis", 0x86 -> "dagger",
      0x87 -> "daggerdbl", 0x88 -> "circumflex", 0x89 -> "perthousand",
      0x8A -> "Scaron", 0x8B -> "guilsinglleft", 0x8C -> "OE",
      0x8E -> "Zcaron", 0x91 -> "quoteleft", 0x92 -> "quoteright",
      0x93 -> "quotedblleft", 0x94 -> "quotedblright", 0x95 -> "bullet",
      0x96 -> "endash", 0x97 -> "emdash", 0x98 -> "tilde",
      0x99 -> "trademark", 0x9A -> "scaron", 0x9B -> "guilsinglright",
      0x9C -> "oe", 0x9E -> "zcaron", 0x9F -> "Ydieresis",
      // Appendix D: 0xA0 renders as space, 0xAD as hyphen
      0xA0 -> "space", 0xAD -> "hyphen")
    // 0xA1-0xFF (minus the two overrides above) carry their Latin-1 names —
    // recover each from the AGL subset by code point
    val latin1 = (0xA1 to 0xFF).filter(c => c != 0xAD)
      .map(c => c -> unicodeToGlyph(new String(Character.toChars(c)))).toMap
    asciiCommon ++ Map(0x27 -> "quotesingle", 0x60 -> "grave") ++ latin1 ++ high
  }

  /** MacRomanEncoding (Appendix D): ASCII with quotesingle/grave plus the
    * Mac OS Roman upper half (the math/symbol slots Appendix D leaves
    * blank stay unmapped and throw on use). */
  val macRoman: Map[Int, String] = asciiCommon ++ Map(
    0x27 -> "quotesingle", 0x60 -> "grave",
    0x80 -> "Adieresis", 0x81 -> "Aring", 0x82 -> "Ccedilla", 0x83 -> "Eacute",
    0x84 -> "Ntilde", 0x85 -> "Odieresis", 0x86 -> "Udieresis", 0x87 -> "aacute",
    0x88 -> "agrave", 0x89 -> "acircumflex", 0x8A -> "adieresis", 0x8B -> "atilde",
    0x8C -> "aring", 0x8D -> "ccedilla", 0x8E -> "eacute", 0x8F -> "egrave",
    0x90 -> "ecircumflex", 0x91 -> "edieresis", 0x92 -> "iacute", 0x93 -> "igrave",
    0x94 -> "icircumflex", 0x95 -> "idieresis", 0x96 -> "ntilde", 0x97 -> "oacute",
    0x98 -> "ograve", 0x99 -> "ocircumflex", 0x9A -> "odieresis", 0x9B -> "otilde",
    0x9C -> "uacute", 0x9D -> "ugrave", 0x9E -> "ucircumflex", 0x9F -> "udieresis",
    0xA0 -> "dagger", 0xA1 -> "degree", 0xA2 -> "cent", 0xA3 -> "sterling",
    0xA4 -> "section", 0xA5 -> "bullet", 0xA6 -> "paragraph", 0xA7 -> "germandbls",
    0xA8 -> "registered", 0xA9 -> "copyright", 0xAA -> "trademark", 0xAB -> "acute",
    0xAC -> "dieresis", 0xAE -> "AE", 0xAF -> "Oslash", 0xB1 -> "plusminus",
    0xB4 -> "yen", 0xB5 -> "mu", 0xBB -> "ordfeminine", 0xBC -> "ordmasculine",
    0xBE -> "ae", 0xBF -> "oslash", 0xC0 -> "questiondown", 0xC1 -> "exclamdown",
    0xC2 -> "logicalnot", 0xC4 -> "florin", 0xC7 -> "guillemotleft",
    0xC8 -> "guillemotright", 0xC9 -> "ellipsis", 0xCA -> "space",
    0xCB -> "Agrave", 0xCC -> "Atilde", 0xCD -> "Otilde", 0xCE -> "OE",
    0xCF -> "oe", 0xD0 -> "endash", 0xD1 -> "emdash", 0xD2 -> "quotedblleft",
    0xD3 -> "quotedblright", 0xD4 -> "quoteleft", 0xD5 -> "quoteright",
    0xD6 -> "divide", 0xD8 -> "ydieresis", 0xD9 -> "Ydieresis",
    0xDA -> "fraction", 0xDB -> "currency", 0xDC -> "guilsinglleft",
    0xDD -> "guilsinglright", 0xDE -> "fi", 0xDF -> "fl", 0xE0 -> "daggerdbl",
    0xE1 -> "periodcentered", 0xE2 -> "quotesinglbase", 0xE3 -> "quotedblbase",
    0xE4 -> "perthousand", 0xE5 -> "Acircumflex", 0xE6 -> "Ecircumflex",
    0xE7 -> "Aacute", 0xE8 -> "Edieresis", 0xE9 -> "Egrave", 0xEA -> "Iacute",
    0xEB -> "Icircumflex", 0xEC -> "Idieresis", 0xED -> "Igrave",
    0xEE -> "Oacute", 0xEF -> "Ocircumflex", 0xF1 -> "Ograve", 0xF2 -> "Uacute",
    0xF3 -> "Ucircumflex", 0xF4 -> "Ugrave", 0xF5 -> "dotlessi",
    0xF6 -> "circumflex", 0xF7 -> "tilde", 0xF8 -> "macron", 0xF9 -> "breve",
    0xFA -> "dotaccent", 0xFB -> "ring", 0xFC -> "cedilla",
    0xFD -> "hungarumlaut", 0xFE -> "ogonek", 0xFF -> "caron")

  /** The named base table; unknown encoding names throw (a silently
    * wrong table would decode pages to plausible garbage). */
  def baseTable(name: String): Map[Int, String] = name match {
    case "StandardEncoding" => standard
    case "WinAnsiEncoding"  => winAnsi
    case "MacRomanEncoding" => macRoman
    case other =>
      throw new IllegalArgumentException(
        s"unsupported PDF base encoding /$other")
  }

  /** code → Unicode decode map for a base table plus /Differences
    * overrides (differences win, per §9.6.6.3). */
  def decodeMap(base: Map[Int, String],
                differences: Map[Int, String]): Map[Int, String] =
    (base ++ differences).map { case (c, n) => c -> glyph(n) }
}

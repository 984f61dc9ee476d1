#!/usr/bin/env python3
"""One-shot mechanical extractor for VERDICT r15 item 8: move each family
file's static oracle-SQL vals into src/main/resources/graft/oracles/
<family>.sql and rewrite the val to an Oracles("<family>", "<key>") call.

Only the two mechanical shapes are transformed automatically:
  private val fooSql = \"\"\"...\"\"\".stripMargin          (fully static)
  private val fooSql = s\"\"\"...${O.dsum("x")}...\"\"\"      (O.* macros only)
Everything else (params coupled to Scala constants, generated SQL) is
listed for manual review and left untouched.

The gate is external: graft.tools.OracleDump before vs after must be
byte-identical.
"""
import re, sys, os, json

QUERIES = "src/main/scala/graft/queries"
RES = "src/main/resources/graft/oracles"

FAMILY = {  # file -> family name (SparkEntry.defGroups)
    "Relational.scala": "relational", "WindowsQ.scala": "windows",
    "TextQ.scala": "text", "DedupQ.scala": "dedup",
    "SimilarityQ.scala": "similarity", "EventsQ.scala": "events",
    "ParityQ.scala": "parity", "AsOfQ.scala": "asof",
    "StatsQ.scala": "stats", "PipelineQ.scala": "pipeline",
    "JdbcQ.scala": "jdbc", "LayoutQ.scala": "layout",
    "SkewQ.scala": "skew", "PackQ.scala": "pack",
    "MediaQ.scala": "media", "MergeQ.scala": "merge",
    "CorpusStatsQ.scala": "corpusstats", "GraphQ.scala": "graph",
    "FormatsQ.scala": "formats", "AnalyticsQ.scala": "analytics",
    "ReshapeQ.scala": "reshape", "StreamParityQ.scala": "streamparity",
}

# private val fooSql = [s]"""...""".stripMargin  (RHS may span lines)
VAL_RE = re.compile(
    r'^(?P<indent>[ \t]*)(?P<mod>private\s+(?:lazy\s+)?val|val)\s+'
    r'(?P<name>\w+Sql)(?:\s*:\s*String)?\s*=\s*(?P<s>s?)"""(?P<body>.*?)"""'
    r'(?P<margin>\s*\.stripMargin)?',
    re.M | re.S)

MACRO_RE = re.compile(r'\$\{O\.(dsum4|dsum|davg)\("((?:[^"\\]|\\.)*)"\)\}')
ANY_INTERP_RE = re.compile(r'\$\{|\$[A-Za-z_]')
HEADER_RE = re.compile(r'^-- ::[A-Za-z0-9_]+\s*$', re.M)
# simple interpolations convertible to {{param}}: bare $ident, or ${expr}
# with no quotes/braces in expr (so the expr text is copyable to the call
# site verbatim), or the $$ escape.
SIMPLE_INTERP_RE = re.compile(r'\$\$|\$\{([^{}"\']+)\}|\$([A-Za-z_]\w*)')


def strip_margin(text):
    out = []
    for line in text.split("\n"):
        m = re.match(r'^[ \t]*\|', line)
        out.append(line[m.end():] if m else line)
    return "\n".join(out)


def main():
    only = set(sys.argv[1:])  # optionally restrict to listed files
    os.makedirs(RES, exist_ok=True)
    report = {"moved": {}, "manual": {}}
    for fname, fam in sorted(FAMILY.items()):
        if only and fname not in only:
            continue
        path = os.path.join(QUERIES, fname)
        src = open(path).read()
        sections, manual = [], []

        def repl(m):
            name, body, interp = m.group("name"), m.group("body"), m.group("s")
            key = name[:-3] if name.endswith("Sql") else name
            if "{{" in body or "}}" in body:
                manual.append(name + " (brace)")
                return m.group(0)
            params = []  # (paramName, scalaExpr) in first-use order
            if interp:
                body = MACRO_RE.sub(
                    lambda mm: "{{%s:%s}}" % (mm.group(1).upper(), mm.group(2)),
                    body)

                def interp_repl(mm):
                    if mm.group(0) == "$$":
                        return "$"
                    expr = mm.group(1) or mm.group(2)
                    if mm.group(2):  # bare ident: param named after it
                        pname = mm.group(2)
                    else:
                        for pn, pe in params:
                            if pe == expr:
                                return "{{%s}}" % pn
                        pname = "e%d" % (len(params) + 1)
                    if not any(pe == expr for _, pe in params):
                        params.append((pname, expr))
                    return "{{%s}}" % pname

                body = SIMPLE_INTERP_RE.sub(interp_repl, body)
                # anything still interpolation-shaped is beyond the simple
                # forms (nested braces/quotes) -> manual
                if ANY_INTERP_RE.search(body) or "$$" in body:
                    manual.append(name)
                    return m.group(0)
                # the s-interpolator processes escapes even in triple
                # quotes: \\ -> \ . Any OTHER escape would also transform;
                # none appear in the registry, so flag rather than guess.
                residue = body.replace("\\\\", "")
                if re.search(r'\\[ntrbf"\'u]', residue):
                    manual.append(name + " (escape)")
                    return m.group(0)
                body = body.replace("\\\\", "\\")
            sql = strip_margin(body) if m.group("margin") else body
            if sql != sql.strip("\n") or HEADER_RE.search(sql):
                manual.append(name + " (shape)")
                return m.group(0)
            sections.append((key, sql))
            args = "".join(',\n%s  "%s" -> String.valueOf(%s)' % (
                m.group("indent"), pn, pe) for pn, pe in params)
            return '%s%s %s = Oracles("%s", "%s"%s)' % (
                m.group("indent"), m.group("mod"), name, fam, key, args)

        new = VAL_RE.sub(repl, src)
        if sections:
            if "import graft.Oracles" not in new and not re.search(
                    r'import graft\.\{[^}]*Oracles', new):
                new = re.sub(r'^(import graft\.QueryDef)$',
                             r'import graft.{Oracles, QueryDef}', new, count=1,
                             flags=re.M)
                if "Oracles" not in new.split("\n\n")[0] + new[:600]:
                    # fallback: add a standalone import after package line
                    new = re.sub(r'^(package graft\.queries\n)',
                                 r'\1\nimport graft.Oracles\n', new, count=1,
                                 flags=re.M)
            open(path, "w").write(new)
            rpath = os.path.join(RES, fam + ".sql")
            with open(rpath, "a") as f:
                for key, sql in sections:
                    f.write("-- ::%s\n%s\n\n" % (key, sql))
        report["moved"][fname] = [k for k, _ in sections]
        report["manual"][fname] = manual
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

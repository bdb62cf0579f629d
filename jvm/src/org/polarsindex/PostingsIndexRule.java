package org.polarsindex;

import java.io.File;
import java.net.URI;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;

import scala.Function1;
import scala.Option;
import scala.collection.immutable.Seq;
import scala.jdk.javaapi.CollectionConverters;
import scala.runtime.AbstractPartialFunction;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.expressions.Alias;
import org.apache.spark.sql.catalyst.expressions.ArrayFilter;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Cast;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThan;
import org.apache.spark.sql.catalyst.expressions.IsNotNull;
import org.apache.spark.sql.catalyst.expressions.LambdaFunction;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.NamedExpression;
import org.apache.spark.sql.catalyst.expressions.NamedLambdaVariable;
import org.apache.spark.sql.catalyst.expressions.Size;
import org.apache.spark.sql.catalyst.expressions.SortArray;
import org.apache.spark.sql.catalyst.expressions.Explode;
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression;
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList;
import org.apache.spark.sql.catalyst.plans.logical.Aggregate;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.Generate;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.Project;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.execution.datasources.HadoopFsRelation;
import org.apache.spark.sql.execution.datasources.LogicalRelation;

/**
 * Catalyst optimizer rule: answer a postings (inverted-index build) query
 * from a materialized index table instead of scanning + aggregating the
 * base table.
 *
 * <p>This is the engine-level form of the Python planning layer in
 * {@code plans/catalog.py} (Hyperspace-style index rewrite, VLDB 2021):
 * the north-star "custom Catalyst optimization for inverted index".  The
 * Python layer remains the portable fallback; this rule fires only when
 * {@code spark.polars.index.root} is set.
 *
 * <p>Matched shape (what {@code operators/inverted_index.postings} plans,
 * i.e. the reference's get_field_values semantic, main.rs:325-385):
 *
 * <pre>
 * Aggregate [g], [g AS value, collect_list(id) AS doc_ids]      (sort_array
 *   +- (pass-through Projects)                                   optional)
 *     +- Filter (isnotnull(field) AND isnotnull(doc_id))
 *       +- (pass-through Projects)
 *         +- LogicalRelation parquet path=.../{table}.parquet
 * </pre>
 *
 * and an index directory {@code <root>/<table>__<field>} (the layout
 * {@code plans/catalog.IndexCatalog.build} writes, with a _SUCCESS marker)
 * must exist.  The rewrite replaces the whole aggregate with a parquet
 * scan of the index projected to the aggregate's exprIds — downstream
 * operators (including a sort_array already fused into the agg) are
 * untouched; index postings are stored sorted so the fused sort is a
 * no-op re-sort.
 *
 * <p>Safety gates (rewrite declined unless ALL hold):
 * <ul>
 * <li>exactly one grouping expression resolving to a bare column of the
 *     base relation (through casts and pass-through projects);</li>
 * <li>exactly two output columns named {@code value} / {@code doc_ids},
 *     the second a non-distinct, unfiltered {@code collect_list};</li>
 * <li>every Filter conjunct between aggregate and relation is either
 *     the null guard {isnotnull(field), isnotnull(doc_id)} (both must be
 *     present) or a predicate referencing ONLY the grouped field while
 *     the field is string-typed at the relation (cast-to-string is then
 *     the identity, so the predicate transfers exactly onto the index's
 *     {@code value} column — this is what makes a value point-lookup
 *     index-served); anything else declines;</li>
 * <li>every intermediate Project is attribute-pass-through (aliases of
 *     columns/casts only);</li>
 * <li>the index directory records the scanned table as its source
 *     ({@code _index_source}, written by IndexCatalog.build) — stem
 *     collisions and relocated tables decline instead of serving wrong
 *     data.  Freshness is the usual index-maintenance contract (rebuild
 *     after base-table rewrites), as with any database index.</li>
 * </ul>
 *
 * <p>Each match re-resolves the index relation via {@code session.read()}
 * — deliberately NOT cached: a fresh resolution mints fresh exprIds, so
 * two rewritten postings subtrees in ONE query (e.g. a self-join of two
 * indexed lookups) can never alias each other's attributes.  The cost is
 * driver-side footer/schema resolution per optimizer match, acceptable
 * for metadata-sized index tables.
 */
public class PostingsIndexRule extends Rule<LogicalPlan> {
  public static final String ROOT_KEY = "spark.polars.index.root";

  private final SparkSession session;

  public PostingsIndexRule(SparkSession session) {
    this.session = session;
  }

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    final String root = conf().getConfString(ROOT_KEY, "");
    if (root.isEmpty()) {
      return plan;
    }
    return (LogicalPlan)
        plan.transformUp(
            new AbstractPartialFunction<LogicalPlan, LogicalPlan>() {
              @Override
              public boolean isDefinedAt(LogicalPlan p) {
                return rewriteAny(p, root) != null;
              }

              @Override
              @SuppressWarnings("unchecked")
              public <A1 extends LogicalPlan, B1> B1 applyOrElse(
                  A1 p, Function1<A1, B1> dflt) {
                LogicalPlan r = rewriteAny(p, root);
                if (r != null) {
                  return (B1) r;
                }
                return dflt.apply(p);
              }
            });
  }

  private LogicalPlan rewriteAny(LogicalPlan p, String root) {
    LogicalPlan r = rewrite(p, root);
    return (r != null) ? r : rewriteConjunctive(p, root);
  }

  /**
   * Count of full O(#files) fingerprint walks — test observability for
   * the listing cache: a warm staleness gate must not increment this.
   */
  public static final java.util.concurrent.atomic.AtomicLong FULL_WALKS =
      new java.util.concurrent.atomic.AtomicLong();

  // path -> {token, digest}; process-wide, twin of functions/listing.py
  private static final java.util.concurrent.ConcurrentHashMap<String, String[]>
      FP_CACHE = new java.util.concurrent.ConcurrentHashMap<>();

  // newest-mtime guard window (git's "racily clean" rule): a tree
  // modified within it is never cached, so a write landing inside the
  // mtime resolution cannot be masked by a token collision
  private static final long RACE_WINDOW_NS = 2_000_000_000L;

  /** Drop cached digests (all paths) — test/maintenance hook. */
  public static void invalidateFingerprintCache() {
    FP_CACHE.clear();
  }

  /**
   * Snapshot digest of a table's data-file listing (see
   * {@link #fullWalkFingerprint}), memoized behind an O(#dirs) mtime
   * token (r8 VERDICT "what's wrong" #1): at 100 TB a table holds
   * 10^5–10^6 part-files and re-listing them per optimizer match is a
   * full driver-side namespace walk per indexed query.  POSIX moves a
   * directory's mtime on every entry add/remove/rename and Spark never
   * mutates parquet data files in place, so any change the size-based
   * digest would see also moves some directory mtime.  Fail-closed: the
   * token is computed BEFORE the walk (a concurrent write can only force
   * a later recompute, never a stale hit), and a recently-modified tree
   * (inside {@link #RACE_WINDOW_NS}) is never cached.  Twin of
   * functions/listing.py — same token construction, same window.
   */
  private static String tableFingerprint(File src) {
    String key = src.getAbsolutePath();
    String token = listingToken(src); // BEFORE the walk — see above
    if (token != null) {
      String[] hit = FP_CACHE.get(key);
      if (hit != null && hit[0].equals(token)) {
        return hit[1];
      }
    }
    String fp = fullWalkFingerprint(src);
    if (token != null && fp != null) {
      FP_CACHE.put(key, new String[] {token, fp});
    } else {
      FP_CACHE.remove(key);
    }
    return fp;
  }

  /**
   * O(#dirs) freshness token: sha256 over sorted "relDir:mtimeNs" lines
   * of every non-hidden directory under {@code src} (root included as
   * "").  Null — meaning "do not cache" — for a lone file, an unreadable
   * tree, or a tree modified within {@link #RACE_WINDOW_NS} of now.
   */
  private static String listingToken(File src) {
    if (!src.isDirectory()) {
      return null;
    }
    List<String> parts = new ArrayList<>();
    long[] newest = new long[] {Long.MIN_VALUE};
    if (!collectDirTokens(src, src, parts, newest)) {
      return null;
    }
    long nowNs = System.currentTimeMillis() * 1_000_000L;
    if (newest[0] > nowNs - RACE_WINDOW_NS) {
      return null;
    }
    java.util.Collections.sort(parts);
    try {
      java.security.MessageDigest md =
          java.security.MessageDigest.getInstance("SHA-256");
      for (String p : parts) {
        md.update((p + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8));
      }
      StringBuilder sb = new StringBuilder();
      for (byte b : md.digest()) {
        sb.append(String.format("%02x", b));
      }
      return sb.toString();
    } catch (java.security.NoSuchAlgorithmException ex) {
      return null;
    }
  }

  private static boolean collectDirTokens(
      File root, File dir, List<String> out, long[] newest) {
    long ns;
    try {
      ns =
          java.nio.file.Files.getLastModifiedTime(dir.toPath())
              .to(java.util.concurrent.TimeUnit.NANOSECONDS);
    } catch (java.io.IOException ex) {
      return false;
    }
    newest[0] = Math.max(newest[0], ns);
    String rel =
        dir.equals(root)
            ? ""
            : root.toPath().relativize(dir.toPath()).toString();
    out.add(rel + ":" + ns);
    File[] kids = dir.listFiles();
    if (kids == null) {
      return false;
    }
    for (File k : kids) {
      String name = k.getName();
      if (name.startsWith(".") || name.startsWith("_")) {
        continue;
      }
      if (k.isDirectory() && !collectDirTokens(root, k, out, newest)) {
        return false;
      }
    }
    return true;
  }

  /**
   * Snapshot digest of a table's data-file listing: sha256 over sorted
   * "relpath:size\n" lines, files/dirs starting with '.' or '_' skipped —
   * BYTE-IDENTICAL to plans/catalog._fingerprint_walk (the
   * two planners must agree on staleness or one serves what the other
   * refuses).  A lone file digests as ":size".
   */
  private static String fullWalkFingerprint(File src) {
    FULL_WALKS.incrementAndGet();
    List<String[]> entries = new ArrayList<>();
    if (src.isFile()) {
      entries.add(new String[] {"", Long.toString(src.length())});
    } else if (src.isDirectory()) {
      collectEntries(src, src, entries);
    } else {
      return null;
    }
    entries.sort(
        (a, b) -> {
          // UTF-8 byte order == Unicode code-point order, matching the
          // Python twin's sorted() exactly.  String.compareTo is UTF-16
          // code-unit order, which disagrees for supplementary-plane
          // filenames (surrogates sort below U+E000..U+FFFF), so the
          // two planners would digest the same listing differently
          // (ADVICE r5).
          byte[] ab = a[0].getBytes(java.nio.charset.StandardCharsets.UTF_8);
          byte[] bb = b[0].getBytes(java.nio.charset.StandardCharsets.UTF_8);
          int n = Math.min(ab.length, bb.length);
          for (int i = 0; i < n; i++) {
            int c = (ab[i] & 0xff) - (bb[i] & 0xff);
            if (c != 0) {
              return c;
            }
          }
          int c = ab.length - bb.length;
          return c != 0 ? c : Long.compare(Long.parseLong(a[1]), Long.parseLong(b[1]));
        });
    try {
      java.security.MessageDigest md =
          java.security.MessageDigest.getInstance("SHA-256");
      for (String[] e : entries) {
        md.update(
            (e[0] + ":" + e[1] + "\n")
                .getBytes(java.nio.charset.StandardCharsets.UTF_8));
      }
      StringBuilder sb = new StringBuilder();
      for (byte b : md.digest()) {
        sb.append(String.format("%02x", b));
      }
      return sb.toString();
    } catch (java.security.NoSuchAlgorithmException ex) {
      return null;
    }
  }

  private static void collectEntries(File root, File dir, List<String[]> out) {
    File[] kids = dir.listFiles();
    if (kids == null) {
      return;
    }
    for (File k : kids) {
      String name = k.getName();
      if (name.startsWith(".") || name.startsWith("_")) {
        continue;
      }
      if (k.isDirectory()) {
        collectEntries(root, k, out);
      } else {
        out.add(
            new String[] {
              root.toPath().relativize(k.toPath()).toString(),
              Long.toString(k.length())
            });
      }
    }
  }

  private LogicalPlan rewrite(LogicalPlan p, String root) {
    if (!(p instanceof Aggregate)) {
      return null;
    }
    Aggregate agg = (Aggregate) p;
    if (agg.groupingExpressions().size() != 1
        || agg.aggregateExpressions().size() != 2) {
      return null;
    }
    Object ne0 = agg.aggregateExpressions().apply(0);
    Object ne1 = agg.aggregateExpressions().apply(1);
    if (!(ne0 instanceof NamedExpression) || !(ne1 instanceof Alias)) {
      return null;
    }
    NamedExpression valueOut = (NamedExpression) ne0;
    Alias docIdsOut = (Alias) ne1;
    if (!"value".equals(valueOut.name())
        || !"doc_ids".equals(docIdsOut.name())) {
      return null;
    }
    // Output-type safety (r8): the index serves `value` as STRING and
    // `doc_ids` as ARRAY<LONG> under the aggregate's exprIds.  The
    // postings operator always casts that way, but a hand-written
    // aggregate grouping a raw non-string field (or collecting a
    // non-long id) would have fixed a different schema at analysis —
    // rewriting it would silently change the plan's output types.
    if (!(((Expression) valueOut).dataType()
        instanceof org.apache.spark.sql.types.StringType)) {
      return null;
    }
    if (!(docIdsOut.dataType()
            instanceof org.apache.spark.sql.types.ArrayType)
        || !(((org.apache.spark.sql.types.ArrayType) docIdsOut.dataType())
                .elementType()
            instanceof org.apache.spark.sql.types.LongType)) {
      return null;
    }
    // doc_ids = collect_list(idExpr), optionally wrapped in an ASCENDING
    // sort_array (index postings are stored ascending; a descending
    // request must not be silently served in the wrong order).
    Expression e = docIdsOut.child();
    if (e instanceof SortArray) {
      SortArray sa = (SortArray) e;
      Object asc = null;
      if (sa.ascendingOrder()
          instanceof org.apache.spark.sql.catalyst.expressions.Literal) {
        asc = ((org.apache.spark.sql.catalyst.expressions.Literal)
            sa.ascendingOrder()).value();
      }
      if (!Boolean.TRUE.equals(asc)) {
        return null;
      }
      e = sa.base();
    }
    if (!(e instanceof AggregateExpression)) {
      return null;
    }
    AggregateExpression ae = (AggregateExpression) e;
    if (!(ae.aggregateFunction() instanceof CollectList)
        || ae.isDistinct()
        || ae.filter().isDefined()) {
      return null;
    }
    Expression idExpr = ((CollectList) ae.aggregateFunction()).child();

    // Descend to the relation through pass-through Projects and the null
    // guard Filter, tracking Projects for attribute resolution.
    List<Project> chain = new ArrayList<>();
    List<Filter> filters = new ArrayList<>();
    LogicalPlan node = agg.child();
    while (true) {
      if (node instanceof Project) {
        Project proj = (Project) node;
        if (!passThrough(proj)) {
          return null;
        }
        chain.add(proj);
        node = proj.child();
      } else if (node instanceof Filter) {
        Filter f = (Filter) node;
        filters.add(f);
        node = f.child();
      } else {
        break;
      }
    }
    if (!(node instanceof LogicalRelation)) {
      return null;
    }
    LogicalRelation rel = (LogicalRelation) node;
    if (!(rel.relation() instanceof HadoopFsRelation)) {
      return null;
    }

    // Resolve grouping + id expressions to base relation column names.
    Expression groupExpr = (Expression) agg.groupingExpressions().apply(0);
    String field = resolveColumn(groupExpr, chain);
    String idCol = resolveColumn(idExpr, chain);
    if (field == null || idCol == null) {
      return null;
    }
    // The value output must BE the grouping column (alias or direct ref).
    Expression valueExpr =
        (valueOut instanceof Alias) ? ((Alias) valueOut).child() : (Expression) valueOut;
    String valueField = resolveColumn(valueExpr, chain);
    if (!field.equals(valueField)) {
      return null;
    }

    // Filter conjuncts: the postings null guard, plus (optionally)
    // predicates on the grouped field alone — those transfer onto the
    // index's value column when the field is string-typed (identity
    // cast), e.g. a value point-lookup pushed below the aggregate — plus
    // (optionally) predicates on the doc-id column alone — every
    // (value, doc_id) pair survives iff pred(doc_id), so a row-level id
    // restriction maps EXACTLY onto filtering each value's postings
    // elements (the id-set / get_field_values_by_doc_ids shape,
    // main.rs:271-395, when plans/rewrite.py chose the isin strategy).
    // The id column must be long-typed at the relation so the pred can be
    // rebound onto the index's array<long> elements without a cast.
    List<String> guarded = new ArrayList<>();
    List<Expression> fieldPreds = new ArrayList<>();
    List<Expression> idPreds = new ArrayList<>();
    for (Filter f : filters) {
      for (Expression c : splitConjuncts(f.condition())) {
        if (c instanceof IsNotNull) {
          String col = resolveColumn(((IsNotNull) c).child(), chain);
          if (col == null) {
            return null;
          }
          guarded.add(col);
        } else if (referencesOnly(c, chain, field)
            && fieldIsString(rel, field)) {
          fieldPreds.add(c);
        } else if (c.deterministic()
            && referencesOnly(c, chain, idCol)
            && fieldIsLong(rel, idCol)) {
          idPreds.add(c);
        } else {
          return null;
        }
      }
    }
    if (!(guarded.contains(field) && guarded.contains(idCol))) {
      return null;
    }
    for (String g : guarded) {
      if (!g.equals(field) && !g.equals(idCol)) {
        return null;
      }
    }

    // Locate the index: <root>/<table>__<field>, table = path file stem.
    HadoopFsRelation fsRel = (HadoopFsRelation) rel.relation();
    if (fsRel.location().rootPaths().size() != 1) {
      return null;
    }
    URI base = fsRel.location().rootPaths().apply(0).toUri();
    String stem = new File(base.getPath()).getName();
    int dot = stem.lastIndexOf('.');
    if (dot > 0) {
      stem = stem.substring(0, dot);
    }
    File idxDir = new File(root, stem + "__" + field);
    if (!new File(idxDir, "_SUCCESS").exists()) {
      return null;
    }
    // Identity check: the index must record the scanned table as its
    // source (written by IndexCatalog.build).  A file stem alone would
    // let two different tables named lineitem.parquet — or a relocated
    // table — be silently answered from the wrong index.  Legacy indexes
    // without the marker are declined.
    File srcMarker = new File(idxDir, "_index_source");
    if (!srcMarker.exists()) {
      return null;
    }
    String recorded;
    try {
      recorded = new String(
              java.nio.file.Files.readAllBytes(srcMarker.toPath()),
              java.nio.charset.StandardCharsets.UTF_8)
          .trim();
    } catch (java.io.IOException ex) {
      return null;
    }
    String scanned = base.getPath();
    // recorded is the common root of the build-time input FILES; the
    // scanned rootPath is what the user passed to read.parquet — equal
    // for single-file tables, a child path for directory tables.
    if (!(recorded.equals(scanned)
        || recorded.startsWith(scanned + "/"))) {
      return null;
    }
    // Full identity marker (_index_meta.json, IndexCatalog.build):
    // - doc_id_col: an index built over doc_id_col=l_orderkey must not
    //   answer a postings query over collect_list(l_partkey) on the same
    //   field — the two postings differ row-for-row;
    // - chunked: a chunked index holds PARTIAL (value, chunk, doc_ids)
    //   rows; serving them unmerged would return multiple partial rows
    //   per value.  Indexes without the marker (legacy or subset builds,
    //   where IndexCatalog withholds it) are declined.
    File metaMarker = new File(idxDir, "_index_meta.json");
    if (!metaMarker.exists()) {
      return null;
    }
    try {
      com.fasterxml.jackson.databind.JsonNode meta =
          new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(metaMarker);
      if (meta.path("chunked").asBoolean(true)) {
        return null;
      }
      if (!idCol.equals(meta.path("doc_id_col").asText(""))) {
        return null;
      }
      // Staleness gate (same contract as IndexCatalog.lookup): the build
      // recorded a digest of the base table's data-file listing + sizes.
      // Spark never rewrites parquet files in place, so any append or
      // overwrite changes the listing; on mismatch the index must NOT be
      // served — fall back to the base-table plan the user wrote.
      com.fasterxml.jackson.databind.JsonNode fpNode = meta.path("fingerprint");
      if (fpNode.isTextual()) {
        String fp = tableFingerprint(new File(recorded));
        if (fp == null || !fp.equals(fpNode.asText())) {
          return null;
        }
      }
    } catch (java.io.IOException ex) {
      return null;
    }

    // Build the replacement: scan of the index, projected onto the
    // aggregate's output exprIds so parent operators re-resolve as-is.
    Dataset<Row> idx = session.read().parquet(idxDir.getAbsolutePath());
    LogicalPlan idxPlan = idx.queryExecution().analyzed();
    Attribute vAttr = findAttr(idxPlan, "value");
    Attribute dAttr = findAttr(idxPlan, "doc_ids");
    if (vAttr == null || dAttr == null || findAttr(idxPlan, "chunk") != null) {
      // schema-level chunk check doubles the meta gate: partial rows must
      // never serve a plain postings query.
      return null;
    }
    if (!(dAttr.dataType() instanceof org.apache.spark.sql.types.ArrayType)) {
      return null;
    }
    // Postings element restriction (id-set queries): rebind the id
    // predicates onto each value's postings via filter(doc_ids, x ->
    // pred(x)), then drop values whose postings emptied — exactly the
    // rows the base-table plan's Filter would have removed.  Order and
    // duplicate multiplicity inside each postings list are preserved.
    Expression docIdsExpr = dAttr;
    if (!idPreds.isEmpty()) {
      org.apache.spark.sql.types.ArrayType arrTy =
          (org.apache.spark.sql.types.ArrayType) dAttr.dataType();
      if (!(arrTy.elementType()
          instanceof org.apache.spark.sql.types.LongType)) {
        return null;
      }
      NamedLambdaVariable lv = new NamedLambdaVariable(
          "pidx_x",
          arrTy.elementType(),
          arrTy.containsNull(),
          org.apache.spark.sql.catalyst.expressions.NamedExpression$
              .MODULE$.newExprId(),
          new java.util.concurrent.atomic.AtomicReference<Object>());
      Expression lamBody = null;
      for (Expression pred : idPreds) {
        Expression onElem = substituteAttrs(pred, lv);
        lamBody = (lamBody == null)
            ? onElem
            : new org.apache.spark.sql.catalyst.expressions.And(
                lamBody, onElem);
      }
      List<NamedExpression> lamArgs = new ArrayList<>();
      lamArgs.add(lv);
      LambdaFunction lam = new LambdaFunction(
          lamBody, CollectionConverters.asScala(lamArgs).toSeq(), false);
      docIdsExpr = new ArrayFilter(dAttr, lam);
    }
    Expression cond = null;
    for (Expression pred : fieldPreds) {
      // Re-apply field predicates against the index's value column
      // (exact: field is string-typed, so cast-to-string was identity).
      Expression onIndex = substituteAttrs(pred, vAttr);
      cond = (cond == null)
          ? onIndex
          : new org.apache.spark.sql.catalyst.expressions.And(
              cond, onIndex);
    }
    if (!idPreds.isEmpty()) {
      Expression nonEmpty = new GreaterThan(
          new Size(docIdsExpr, false),
          new Literal(0, org.apache.spark.sql.types.DataTypes.IntegerType));
      cond = (cond == null)
          ? nonEmpty
          : new org.apache.spark.sql.catalyst.expressions.And(
              cond, nonEmpty);
    }
    LogicalPlan source =
        (cond == null) ? idxPlan : new Filter(cond, idxPlan);
    Seq<String> noQual = CollectionConverters.asScala(
        new ArrayList<String>()).toSeq();
    NamedExpression vOut = new Alias(
        vAttr, "value", valueOut.exprId(), noQual,
        Option.empty(), noQual);
    NamedExpression dOut = new Alias(
        docIdsExpr, "doc_ids", docIdsOut.exprId(), noQual,
        Option.empty(), noQual);
    Seq<NamedExpression> projList =
        CollectionConverters.asScala(Arrays.asList(vOut, dOut)).toSeq();
    logInfo(
        () ->
            "PostingsIndexRule: rewrote postings("
                + field
                + ") onto index "
                + idxDir.getAbsolutePath());
    return new Project(projList, source);
  }

  /**
   * Composite-index rewrite (r8): serve a CONJUNCTIVE doc-id lookup —
   * the {@code Engine.get_doc_ids_where} fallback shape
   *
   * <pre>
   * Project [doc_id]
   *   +- Filter (pred(f1) AND pred(f2) AND isnotnull(doc_id) ...)
   *     +- LogicalRelation parquet {table}
   * </pre>
   *
   * — from a tuple-keyed composite index
   * {@code <root>/<table>__<f1>__AND__<f2>} ({@code
   * plans/catalog.IndexCatalog.build_composite}): predicates rebind
   * onto the index's {@code v_<field>} string columns (each lands as
   * its own parquet pushed filter) and the matching rows' postings
   * explode back to one doc-id row per base row — multiplicity
   * preserved, zero base-table I/O.
   *
   * <p>Gates: single-column Project resolving to a long-typed id with
   * an {@code isnotnull(id)} guard present (the composite build
   * suppressed null ids, so serving without the guard would drop rows
   * the base plan keeps); every other conjunct deterministic and
   * referencing exactly ONE string-typed column; the predicate column
   * SET equals the index's recorded {@code composite_fields} exactly
   * (a subset conjunction stays on the base plan — parity with the
   * Python lookup's decline rule); same source-identity, doc_id_col
   * and fingerprint-staleness gates as the postings rewrite.
   */
  private LogicalPlan rewriteConjunctive(LogicalPlan p, String root) {
    if (!(p instanceof Project)) {
      return null;
    }
    Project top = (Project) p;
    if (top.projectList().size() != 1) {
      return null;
    }
    NamedExpression idOut = (NamedExpression) top.projectList().apply(0);

    List<Project> chain = new ArrayList<>();
    List<Filter> filters = new ArrayList<>();
    LogicalPlan node = top.child();
    while (true) {
      if (node instanceof Project) {
        Project proj = (Project) node;
        if (!passThrough(proj)) {
          return null;
        }
        chain.add(proj);
        node = proj.child();
      } else if (node instanceof Filter) {
        Filter f = (Filter) node;
        filters.add(f);
        node = f.child();
      } else {
        break;
      }
    }
    if (filters.isEmpty() || !(node instanceof LogicalRelation)) {
      return null;
    }
    LogicalRelation rel = (LogicalRelation) node;
    if (!(rel.relation() instanceof HadoopFsRelation)) {
      return null;
    }
    Expression idExpr =
        (idOut instanceof Alias) ? ((Alias) idOut).child() : (Expression) idOut;
    // Output-type safety: the served Generate emits LONG ids under the
    // original output exprId.  resolveColumn looks THROUGH casts, so a
    // cast-wrapped id projection (select(col("doc_id").cast("string")))
    // would pass the relation-type gate while the analyzed plan's
    // output type is string — the rewrite would silently change the
    // plan's schema post-analysis (downstream UnsafeRow readers would
    // misread the long).  Require the projected expression to be a
    // CAST-FREE column chain AND long-typed end to end.
    if (!(((Expression) idOut).dataType()
        instanceof org.apache.spark.sql.types.LongType)) {
      return null;
    }
    String idCol = resolveColumnNoCast(idExpr, chain);
    if (idCol == null || !fieldIsLong(rel, idCol)) {
      return null;
    }

    List<String> guarded = new ArrayList<>();
    Map<String, List<Expression>> fieldPreds = new LinkedHashMap<>();
    for (Filter f : filters) {
      for (Expression c : splitConjuncts(f.condition())) {
        if (c instanceof IsNotNull) {
          String col = resolveColumn(((IsNotNull) c).child(), chain);
          if (col == null) {
            return null;
          }
          guarded.add(col);
        } else if (c.deterministic()) {
          String col = singleReferencedColumn(c, chain);
          if (col == null || col.equals(idCol)
              || !fieldIsString(rel, col)) {
            return null;
          }
          fieldPreds.computeIfAbsent(col, k -> new ArrayList<>()).add(c);
        } else {
          return null;
        }
      }
    }
    if (fieldPreds.size() < 2 || !guarded.contains(idCol)) {
      return null;
    }
    for (String g : guarded) {
      if (!g.equals(idCol) && !fieldPreds.containsKey(g)) {
        return null;
      }
    }
    // Null-semantics gate: the composite build SUPPRESSED null-component
    // tuples, so a predicate that can be TRUE on a null field value
    // (IS NULL, <=> null, coalesce tricks) would lose rows the base plan
    // returns.  Requiring an isnotnull(f) guard for EVERY predicate
    // field makes the base plan exclude exactly the suppressed rows:
    // Catalyst infers isnotnull from null-intolerant predicates
    // (equality and friends), so the intended conjunctive shapes carry
    // the guards for free, while null-matching plans never do — they
    // decline to the base plan instead of silently dropping rows.
    for (String f : fieldPreds.keySet()) {
      if (!guarded.contains(f)) {
        return null;
      }
    }

    HadoopFsRelation fsRel = (HadoopFsRelation) rel.relation();
    if (fsRel.location().rootPaths().size() != 1) {
      return null;
    }
    URI base = fsRel.location().rootPaths().apply(0).toUri();
    String stem = new File(base.getPath()).getName();
    int dot = stem.lastIndexOf('.');
    if (dot > 0) {
      stem = stem.substring(0, dot);
    }
    List<String> sortedFields = new ArrayList<>(fieldPreds.keySet());
    java.util.Collections.sort(sortedFields);
    File idxDir =
        new File(root, stem + "__" + String.join("__AND__", sortedFields));
    if (!new File(idxDir, "_SUCCESS").exists()) {
      return null;
    }
    File srcMarker = new File(idxDir, "_index_source");
    if (!srcMarker.exists()) {
      return null;
    }
    String recorded;
    try {
      recorded = new String(
              java.nio.file.Files.readAllBytes(srcMarker.toPath()),
              java.nio.charset.StandardCharsets.UTF_8)
          .trim();
    } catch (java.io.IOException ex) {
      return null;
    }
    String scanned = base.getPath();
    if (!(recorded.equals(scanned)
        || recorded.startsWith(scanned + "/"))) {
      return null;
    }
    File metaMarker = new File(idxDir, "_index_meta.json");
    if (!metaMarker.exists()) {
      return null;
    }
    try {
      com.fasterxml.jackson.databind.JsonNode meta =
          new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(metaMarker);
      if (!idCol.equals(meta.path("doc_id_col").asText(""))) {
        return null;
      }
      com.fasterxml.jackson.databind.JsonNode cf =
          meta.path("composite_fields");
      if (!cf.isArray() || cf.size() != sortedFields.size()) {
        return null;
      }
      for (int i = 0; i < cf.size(); i++) {
        if (!sortedFields.get(i).equals(cf.get(i).asText(""))) {
          return null;
        }
      }
      com.fasterxml.jackson.databind.JsonNode fpNode =
          meta.path("fingerprint");
      if (fpNode.isTextual()) {
        String fp = tableFingerprint(new File(recorded));
        if (fp == null || !fp.equals(fpNode.asText())) {
          return null;
        }
      }
    } catch (java.io.IOException ex) {
      return null;
    }

    Dataset<Row> idx = session.read().parquet(idxDir.getAbsolutePath());
    LogicalPlan idxPlan = idx.queryExecution().analyzed();
    Attribute dAttr = findAttr(idxPlan, "doc_ids");
    if (dAttr == null
        || !(dAttr.dataType()
            instanceof org.apache.spark.sql.types.ArrayType)) {
      return null;
    }
    org.apache.spark.sql.types.ArrayType arrTy =
        (org.apache.spark.sql.types.ArrayType) dAttr.dataType();
    if (!(arrTy.elementType()
        instanceof org.apache.spark.sql.types.LongType)) {
      return null;
    }
    Expression cond = null;
    for (Map.Entry<String, List<Expression>> en : fieldPreds.entrySet()) {
      Attribute vAttr = findAttr(idxPlan, "v_" + en.getKey());
      if (vAttr == null) {
        return null;
      }
      for (Expression pred : en.getValue()) {
        Expression onIndex = substituteAttrs(pred, vAttr);
        cond = (cond == null)
            ? onIndex
            : new org.apache.spark.sql.catalyst.expressions.And(
                cond, onIndex);
      }
    }
    LogicalPlan source = new Filter(cond, idxPlan);

    // explode the matching rows' postings back to one id row per base
    // row; the Generate output takes the ORIGINAL Project's exprId via
    // the final aliasing Project so parents re-resolve untouched
    Attribute genOut = new AttributeReference(
        "pidx_id",
        arrTy.elementType(),
        arrTy.containsNull(),
        org.apache.spark.sql.types.Metadata.empty(),
        org.apache.spark.sql.catalyst.expressions.NamedExpression$
            .MODULE$.newExprId(),
        CollectionConverters.asScala(new ArrayList<String>()).toSeq());
    List<Attribute> genOutList = new ArrayList<>();
    genOutList.add(genOut);
    Generate gen = new Generate(
        new Explode(dAttr),
        CollectionConverters.asScala(new ArrayList<Object>()).toSeq(),
        false,
        Option.empty(),
        CollectionConverters.asScala(genOutList).toSeq(),
        source);
    Seq<String> noQual = CollectionConverters.asScala(
        new ArrayList<String>()).toSeq();
    NamedExpression out = new Alias(
        genOut, idOut.name(), idOut.exprId(), noQual,
        Option.empty(), noQual);
    List<NamedExpression> projList = new ArrayList<>();
    projList.add(out);
    final String fieldsDesc = String.join(",", sortedFields);
    logInfo(
        () ->
            "PostingsIndexRule: rewrote conjunctive lookup ("
                + fieldsDesc
                + ") onto composite index "
                + idxDir.getAbsolutePath());
    return new Project(
        CollectionConverters.asScala(projList).toSeq(), gen);
  }

  /** Like {@link #resolveColumn} but REFUSES casts anywhere on the
   * substitution path — for outputs whose runtime TYPE must equal the
   * relation column's (the conjunctive id projection). */
  private static String resolveColumnNoCast(
      Expression e, List<Project> chain) {
    int depth = 0;
    while (true) {
      if (e instanceof Alias) {
        e = ((Alias) e).child();
        continue;
      }
      if (!(e instanceof AttributeReference)) {
        return null;
      }
      AttributeReference attr = (AttributeReference) e;
      Expression next = null;
      for (int i = depth; i < chain.size() && next == null; i++) {
        Project proj = chain.get(i);
        for (int j = 0; j < proj.projectList().size(); j++) {
          NamedExpression ne = (NamedExpression) proj.projectList().apply(j);
          if (ne instanceof Alias
              && ne.exprId().equals(attr.exprId())) {
            next = ((Alias) ne).child();
            depth = i + 1;
            break;
          }
        }
      }
      if (next == null) {
        return attr.name();
      }
      e = next;
    }
  }

  /** The single base-relation column {@code e} references, or null when
   * it references zero or several. */
  private static String singleReferencedColumn(
      Expression e, List<Project> chain) {
    scala.collection.Iterator<Attribute> it = e.references().iterator();
    String col = null;
    while (it.hasNext()) {
      String r = resolveColumn(it.next(), chain);
      if (r == null || (col != null && !col.equals(r))) {
        return null;
      }
      col = r;
    }
    return col;
  }

  /** Every attribute referenced by {@code e} resolves to {@code field}. */
  private static boolean referencesOnly(
      Expression e, List<Project> chain, String field) {
    scala.collection.Iterator<Attribute> it = e.references().iterator();
    boolean any = false;
    while (it.hasNext()) {
      Attribute a = it.next();
      any = true;
      if (!field.equals(resolveColumn(a, chain))) {
        return false;
      }
    }
    return any;
  }

  /** The grouped field's type AT THE RELATION is string. */
  private static boolean fieldIsString(LogicalRelation rel, String field) {
    for (int i = 0; i < rel.output().size(); i++) {
      Attribute a = (Attribute) rel.output().apply(i);
      if (a.name().equals(field)) {
        return a.dataType()
            instanceof org.apache.spark.sql.types.StringType;
      }
    }
    return false;
  }

  /** The named column's type AT THE RELATION is long (matches the
   * index's array&lt;long&gt; postings elements, so an id predicate can be
   * rebound onto them cast-free). */
  private static boolean fieldIsLong(LogicalRelation rel, String field) {
    for (int i = 0; i < rel.output().size(); i++) {
      Attribute a = (Attribute) rel.output().apply(i);
      if (a.name().equals(field)) {
        return a.dataType()
            instanceof org.apache.spark.sql.types.LongType;
      }
    }
    return false;
  }

  /** Replace every attribute reference in {@code e} with {@code attr}
   * (callers guarantee e references a single logical column). */
  private static Expression substituteAttrs(
      Expression e, Expression attr) {
    return (Expression)
        e.transformUp(
            new AbstractPartialFunction<Expression, Expression>() {
              @Override
              public boolean isDefinedAt(Expression x) {
                return x instanceof AttributeReference;
              }

              @Override
              @SuppressWarnings("unchecked")
              public <A1 extends Expression, B1> B1 applyOrElse(
                  A1 x, Function1<A1, B1> dflt) {
                if (x instanceof AttributeReference) {
                  return (B1) attr;
                }
                return dflt.apply(x);
              }
            });
  }

  /** Project is pass-through when every entry aliases a column or cast. */
  private static boolean passThrough(Project proj) {
    for (int i = 0; i < proj.projectList().size(); i++) {
      Expression e = (Expression) proj.projectList().apply(i);
      if (e instanceof Alias) {
        e = ((Alias) e).child();
      }
      while (e instanceof Cast) {
        e = ((Cast) e).child();
      }
      if (!(e instanceof AttributeReference)) {
        return false;
      }
    }
    return true;
  }

  /**
   * Resolve an expression to the base-relation column it reads, looking
   * through casts and the pass-through Project chain (ordered top-down).
   * Returns null when the expression is anything but a (possibly cast,
   * possibly re-aliased) single column.
   */
  private static String resolveColumn(Expression e, List<Project> chain) {
    int depth = 0;
    while (true) {
      while (e instanceof Cast) {
        e = ((Cast) e).child();
      }
      if (e instanceof Alias) {
        e = ((Alias) e).child();
        continue;
      }
      if (!(e instanceof AttributeReference)) {
        return null;
      }
      AttributeReference attr = (AttributeReference) e;
      // Substitute through the next Project that defines this attr.
      Expression next = null;
      for (int i = depth; i < chain.size() && next == null; i++) {
        Project proj = chain.get(i);
        for (int j = 0; j < proj.projectList().size(); j++) {
          NamedExpression ne = (NamedExpression) proj.projectList().apply(j);
          if (ne instanceof Alias
              && ne.exprId().equals(attr.exprId())) {
            next = ((Alias) ne).child();
            depth = i + 1;
            break;
          }
        }
      }
      if (next == null) {
        return attr.name();
      }
      e = next;
    }
  }

  private static List<Expression> splitConjuncts(Expression cond) {
    List<Expression> out = new ArrayList<>();
    ArrayList<Expression> stack = new ArrayList<>();
    stack.add(cond);
    while (!stack.isEmpty()) {
      Expression c = stack.remove(stack.size() - 1);
      if (c instanceof org.apache.spark.sql.catalyst.expressions.And) {
        stack.add(((org.apache.spark.sql.catalyst.expressions.And) c).left());
        stack.add(((org.apache.spark.sql.catalyst.expressions.And) c).right());
      } else {
        out.add(c);
      }
    }
    return out;
  }

  private static Attribute findAttr(LogicalPlan plan, String name) {
    for (int i = 0; i < plan.output().size(); i++) {
      Attribute a = (Attribute) plan.output().apply(i);
      if (a.name().equals(name)) {
        return a;
      }
    }
    return null;
  }
}

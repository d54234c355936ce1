"""DuckDB oracle SQL for the flagship export surface (VERDICT round-1 #2).

Builds, from the SAME mapping the Ray pipeline uses, SQL that re-derives
the export results first-principles-style over the raw corpus parquet:
span UNNEST + JSON extraction + set algebra — no shared code with the
engine's explode/assemble/feature stages, so a disagreement means a real
bug on one side.

Covered (exactly, for the deterministic corpus):
* ``export_theme_counts`` — full per-theme×geomtype counts including way
  completeness, closed-way polygon routing (reference tabular.py:18-27,
  279-339) and relation assembly validity. Ring stitchability is encoded
  as the endpoint-parity criterion (every member-way endpoint node must
  pair up), which is exact for the corpus's ring topologies (split arcs,
  closed holes, dangling arcs) though not for arbitrary self-touching
  inputs — documented approximation.
* ``tile_assignment`` — themed feature bboxes → z12 tile ranges joined
  against the deduped tile payload rows (engine: stages/tiling.py).
* ``aoi_extract`` — themed features semi-joined to the rectangle AOI
  [0,1]×[0,1] with the engine's cell-cover coarse filter + exact
  point-status/vertex-or-edge-crossing tests (stages/spatial_filter.py;
  boundary points COUNT, ``boundary_counts=True``).

Matcher quirk parity in SQL (reference sql.py:74-98): type-strict ``=`` /
``!=`` / ``in`` (int rvals cannot match string tags), lexicographic VARCHAR
compares for ordering ops, ``notnull`` = key presence; every atom is
coalesced two-valued so SQL NULL logic cannot diverge from the reference's
boolean evaluation.
"""

import numpy as np

from osm_export_tool_python_ray.functions.cells import DEFAULT_RES, cover_polygon
from osm_export_tool_python_ray.functions.kernels import PreparedPolygon
from osm_export_tool_python_ray.functions.quantize import sql_qfloor
from osm_export_tool_python_ray.stages.matcher_eval import (
    CLOSED_WAY_KEYS,
    CLOSED_WAY_KEYVALS,
)

_AREA_RELATION_TYPES = ("multipolygon", "boundary")


def _esc(s):
    return str(s).replace("'", "''")


def _safe_key(k):
    """Reject tag keys the DuckDB JSON path cannot address.

    A key rides into BOTH a SQL string literal (escapable) and a
    ``$.tags."<key>"`` JSON path (a double quote, or a single quote
    escaped for the literal but not the path, silently redirects the
    extraction) — and the divergence would be oracle-vs-engine, not
    shared, so the oracle would undercount while the engine's
    extract_tag_columns handles the key fine (ADVICE r4). OSM keys never
    legitimately contain quotes; fail loudly at SQL-build time."""
    k = str(k)
    if "'" in k or '"' in k:
        raise ValueError(
            "mapping tag key %r contains a quote character; the DuckDB "
            "oracle cannot address it in a JSON path — rename the key" % k
        )
    return k


def _tag(k):
    # JSON path with a quoted key survives ':' in OSM keys
    return "json_extract_string(txt, '$.tags.\"%s\"')" % _safe_key(k)


def matcher_sql(expr):
    """Prefix tuple tree → two-valued DuckDB boolean expression with the
    reference's exact quirks (see module docstring)."""
    if not expr:
        return "FALSE"
    op = expr[0]
    if op in ("and", "or"):
        return "(%s %s %s)" % (matcher_sql(expr[1]), op.upper(), matcher_sql(expr[2]))
    k = expr[1]
    t = _tag(k)
    if op == "notnull":
        return "(%s IS NOT NULL)" % t
    if op == "=":
        if not isinstance(expr[2], str):
            return "FALSE"  # type-strict: int rval never equals a string tag
        return "coalesce(%s = '%s', FALSE)" % (t, _esc(expr[2]))
    if op == "!=":
        if not isinstance(expr[2], str):
            return "TRUE"  # None/str both != int
        return "coalesce(%s != '%s', TRUE)" % (t, _esc(expr[2]))
    if op == "in":
        vals = [v for v in expr[2] if isinstance(v, str)]
        if not vals:
            return "FALSE"
        return "coalesce(%s IN (%s), FALSE)" % (
            t,
            ", ".join("'%s'" % _esc(v) for v in vals),
        )
    if op in (">", "<", ">=", "<="):
        # reference coerces BOTH sides with str() → lexicographic compare
        return "coalesce(%s %s '%s', FALSE)" % (t, op, _esc(str(expr[2])))
    raise ValueError("unknown op %r" % (op,))


def polygonish_sql():
    parts = ["(%s IS NOT NULL)" % _tag(k) for k in CLOSED_WAY_KEYS]
    parts += [
        "coalesce(%s = '%s', FALSE)" % (_tag(k), _esc(v))
        for k, v in CLOSED_WAY_KEYVALS.items()
    ]
    return "(" + " OR ".join(parts) + ")"


# --------------------------------------------------------------- base CTEs

def _base_ctes(corpus_path):
    """Shared CTEs: distinct elements, nodes, way stats (closed / complete /
    bbox), relation validity + bbox. DISTINCT on the serialized payload is
    the D4 exact dedup (identical (kind,id) spans carry identical JSON)."""
    return """
raw AS MATERIALIZED (
  -- MATERIALIZED + json_valid stop DuckDB from speculatively evaluating
  -- the downstream JSON extractors on text spans before the kind filter
  SELECT DISTINCT s.text AS txt
  FROM (SELECT UNNEST(spans) AS s FROM read_parquet('{corpus}'))
  WHERE s.kind = 'osm' AND json_valid(s.text)
),
el AS (
  SELECT txt,
         json_extract_string(txt, '$.type') AS etype,
         CAST(json_extract(txt, '$.id') AS BIGINT) AS id,
         coalesce(json_array_length(json_keys(json_extract(txt, '$.tags'))), 0) > 0 AS tagged
  FROM raw
),
nodes AS (
  SELECT id,
         CAST(json_extract(txt, '$.lon') AS DOUBLE) AS lon,
         CAST(json_extract(txt, '$.lat') AS DOUBLE) AS lat,
         tagged, txt
  FROM el WHERE etype = 'node'
),
ways AS (
  SELECT id, CAST(json_extract(txt, '$.refs') AS BIGINT[]) AS refs, tagged, txt
  FROM el WHERE etype = 'way'
),
wref AS (
  SELECT id AS way_id, UNNEST(refs) AS ref FROM ways
),
wgeom AS (
  SELECT r.way_id,
         bool_and(n.id IS NOT NULL) AS complete,
         count(*) AS n_pts,
         min(n.lon) AS minx, min(n.lat) AS miny,
         max(n.lon) AS maxx, max(n.lat) AS maxy
  FROM wref r LEFT JOIN nodes n ON n.id = r.ref
  GROUP BY r.way_id
),
wstat AS (
  SELECT w.id, w.txt, w.tagged, g.complete, g.n_pts,
         (len(w.refs) >= 4 AND w.refs[1] = w.refs[len(w.refs)]) AS closed,
         g.minx, g.miny, g.maxx, g.maxy
  FROM ways w JOIN wgeom g ON g.way_id = w.id
),
rels AS (
  SELECT id, txt, tagged,
         CAST(json_extract(txt, '$.members')
              AS STRUCT(type VARCHAR, ref BIGINT, role VARCHAR)[]) AS members
  FROM el
  WHERE etype = 'relation'
    AND tagged
    AND {tagtype} IN ({reltypes})
    AND {polygonish}
),
rmem AS (
  SELECT id AS rel_id, UNNEST(members) AS m FROM rels
),
rway AS (
  SELECT rm.rel_id, rm.m.role AS role, w.id AS way_id, w.refs,
         g.complete, g.minx, g.miny, g.maxx, g.maxy
  FROM rmem rm
  LEFT JOIN ways w ON w.id = rm.m.ref
  LEFT JOIN wgeom g ON g.way_id = rm.m.ref
  WHERE rm.m.type = 'way'
),
rends AS (
  SELECT rel_id, ep FROM (
    SELECT rel_id, refs[1] AS ep FROM rway WHERE refs IS NOT NULL
    UNION ALL
    SELECT rel_id, refs[len(refs)] AS ep FROM rway WHERE refs IS NOT NULL
  )
),
rparity AS (
  SELECT rel_id, bool_and(cnt % 2 = 0) AS closed_ok
  FROM (SELECT rel_id, ep, count(*) AS cnt FROM rends GROUP BY rel_id, ep)
  GROUP BY rel_id
),
rstat AS (
  SELECT r.id, r.txt, TRUE AS tagged,
         (count(w.way_id) > 0
          AND bool_and(w.way_id IS NOT NULL AND coalesce(w.complete, FALSE))
          AND bool_and(coalesce(p.closed_ok, FALSE))
          AND count(*) FILTER (WHERE coalesce(w.role, 'outer') != 'inner') > 0
         ) AS valid,
         min(w.minx) AS minx, min(w.miny) AS miny,
         max(w.maxx) AS maxx, max(w.maxy) AS maxy
  FROM rels r
  LEFT JOIN rway w ON w.rel_id = r.id
  LEFT JOIN rparity p ON p.rel_id = r.id
  GROUP BY r.id, r.txt
)
""".format(
        corpus=corpus_path,
        tagtype=_tag("type"),
        reltypes=", ".join("'%s'" % t for t in _AREA_RELATION_TYPES),
        polygonish=polygonish_sql(),
    )


def _themed_feature_selects(mapping, with_txt=False):
    """UNION ALL branches: one (theme, osm_id, geom_type, bbox) row per
    themed feature — the SQL twin of PointFeatures/WayFeatures/
    RelationAreaFeatures + ThemeRouter (stages/features.py).
    ``with_txt`` additionally carries the element's raw JSON (for
    tag-level audits like sql_layer_fill_rates)."""
    poly = polygonish_sql()
    tx = ", txt" if with_txt else ""
    branches = []
    for t in mapping.themes:
        m = matcher_sql(t.matcher.expr)
        if t.points:
            branches.append(
                "SELECT '%s' AS theme, id AS osm_id, 1 AS geom_type, "
                "lon AS minx, lat AS miny, lon AS maxx, lat AS maxy%s "
                "FROM nodes WHERE tagged AND %s" % (_esc(t.name), tx, m)
            )
        if t.lines:
            branches.append(
                "SELECT '%s' AS theme, id AS osm_id, 2 AS geom_type, "
                "minx, miny, maxx, maxy%s FROM wstat "
                "WHERE tagged AND complete AND n_pts >= 2 "
                "AND NOT (closed AND %s) AND %s" % (_esc(t.name), tx, poly, m)
            )
        if t.polygons:
            branches.append(
                "SELECT '%s' AS theme, id AS osm_id, 3 AS geom_type, "
                "minx, miny, maxx, maxy%s FROM wstat "
                "WHERE tagged AND complete AND closed AND %s AND %s"
                % (_esc(t.name), tx, poly, m)
            )
            branches.append(
                "SELECT '%s' AS theme, -id AS osm_id, 3 AS geom_type, "
                "minx, miny, maxx, maxy%s FROM rstat "
                "WHERE valid AND %s" % (_esc(t.name), tx, m)
            )
    return "feat AS (\n" + "\nUNION ALL\n".join(branches) + "\n)"


def sql_export_theme_counts(corpus_path, mapping):
    return "WITH %s,\n%s\nSELECT theme, geom_type, count(*) AS n FROM feat GROUP BY theme, geom_type" % (
        _base_ctes(corpus_path),
        _themed_feature_selects(mapping),
    )


def sql_theme_cooccurrence(corpus_path, mapping):
    """Per-(theme pair, geom_type) counts of features routed to BOTH
    themes — the multi-label side of ThemeRouter (a feature matching two
    matchers emits two rows) re-derived as a self-join over the same
    per-theme feat branches sql_export_theme_counts uses."""
    return (
        "WITH %s,\n%s\n"
        "SELECT a.theme AS theme_a, b.theme AS theme_b, "
        "CAST(a.geom_type AS BIGINT) AS geom_type, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM feat a JOIN feat b "
        "ON a.osm_id = b.osm_id AND a.geom_type = b.geom_type "
        "AND a.theme < b.theme "
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
        % (_base_ctes(corpus_path), _themed_feature_selects(mapping))
    )


def sql_layer_fill_rates(corpus_path, mapping):
    """Per-(theme, selected column) fill rates over the themed export
    surface: how many routed feature rows actually carry each column the
    mapping selects — the audit that finds dead `select:` entries. Tag
    presence is re-extracted from the element JSON per (theme, col) via
    a VALUES join, so the SQL shares nothing with ThemeProjector."""
    cols = []
    for t in mapping.themes:
        for k in sorted(t.keys):
            cols.append("('%s', '%s')" % (_esc(t.name), _esc(_safe_key(k))))
    return (
        "WITH %s,\n%s,\n"
        "cols(theme, col) AS (VALUES %s),\n"
        "j AS (SELECT f.theme, c.col, CASE WHEN json_extract_string("
        "f.txt, '$.tags.\"' || c.col || '\"') IS NOT NULL THEN 1 ELSE 0 "
        "END AS p FROM feat f JOIN cols c ON c.theme = f.theme)\n"
        "SELECT theme, col, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(p) AS BIGINT) AS n_present "
        "FROM j GROUP BY 1, 2 ORDER BY 1, 2"
        % (
            _base_ctes(corpus_path),
            _themed_feature_selects(mapping, with_txt=True),
            ", ".join(cols),
        )
    )


def sql_gpkg_layer_counts(corpus_path, mapping):
    """Per-layer × geometry-class row counts and osm_id sums, re-derived
    from the raw corpus. The engine side reads these numbers BACK out of
    the finished binary .gpkg (sqlite3 + GPKG blob parsing,
    queries.q_gpkg_layer_counts), so any loss in the container encode —
    dropped row, corrupted osm_id, mislabelled WKB class — hash-mismatches
    here. Layer name == theme name (sinks.Geopackage one-layer-per-theme,
    reference tabular.py:146-196)."""
    return (
        "WITH %s,\n%s\n"
        "SELECT theme AS layer, CAST(geom_type AS BIGINT) AS geom_type,"
        " count(*) AS n, CAST(sum(osm_id) AS BIGINT) AS id_sum\n"
        "FROM feat GROUP BY theme, geom_type"
        % (_base_ctes(corpus_path), _themed_feature_selects(mapping))
    )


def sql_shp_layer_counts(corpus_path, mapping):
    """Same re-derivation as :func:`sql_gpkg_layer_counts` — the engine
    side differs (raw .shp/.dbf parsed back instead of sqlite), the truth
    does not: per theme × geometry class counts and osm_id sums."""
    return sql_gpkg_layer_counts(corpus_path, mapping)


def sql_kml_layer_counts(corpus_path, mapping):
    """Same re-derivation, engine side reads the .kml XML back."""
    return sql_gpkg_layer_counts(corpus_path, mapping)


def sql_geojson_layer_counts(corpus_path, mapping):
    """Same re-derivation, engine side reads the .geojsonl lines back."""
    return sql_gpkg_layer_counts(corpus_path, mapping)


def sql_pbf_element_stats(corpus_path):
    """Independent SQL derivation certifying the .osm.pbf codec
    (sources/pbf.py): per-kind element count, id sum, tag/ref/member
    totals and the 1e-7-grid coordinate checksum, derived straight from
    the corpus JSON spans (DISTINCT-payload dedup ≡ the engine's ekey
    dedup for this corpus — identical (kind,id) spans carry identical
    JSON). The engine side answers from the pbf ROUND-TRIP (elements →
    write_osm_pbf → read_osm_pbf), so a writer or reader bug in varint /
    zigzag / delta / string-table / coordinate handling breaks the
    hash."""
    return """
WITH raw AS (
  SELECT DISTINCT s.text AS txt
  FROM (SELECT UNNEST(spans) AS s FROM read_parquet('%s'))
  WHERE s.kind = 'osm' AND json_valid(s.text)
),
el AS (
  SELECT json_extract_string(txt, '$.type') AS kind,
         CAST(json_extract(txt, '$.id') AS BIGINT) AS id,
         coalesce(json_array_length(json_keys(json_extract(txt, '$.tags'))), 0) AS ntags,
         coalesce(json_array_length(json_extract(txt, '$.refs')), 0) AS nrefs,
         coalesce(json_array_length(json_extract(txt, '$.members')), 0) AS nmem,
         CASE WHEN json_extract_string(txt, '$.type') = 'node'
              THEN CAST(round(CAST(json_extract(txt, '$.lon') AS DOUBLE) * 1e7) AS BIGINT)
                 + CAST(round(CAST(json_extract(txt, '$.lat') AS DOUBLE) * 1e7) AS BIGINT)
              ELSE 0 END AS coord
  FROM raw
)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(id) AS BIGINT) AS id_sum,
       CAST(sum(ntags) AS BIGINT) AS tag_sum,
       CAST(sum(nrefs) AS BIGINT) AS ref_sum,
       CAST(sum(nmem) AS BIGINT) AS member_sum,
       CAST(sum(coord) AS BIGINT) AS coord_sum
FROM el GROUP BY kind ORDER BY kind
""" % corpus_path


def sql_tile_assignment(corpus_path, mapping, zoom=12):
    """One row per deduped tile payload with the count of themed-feature
    bbox overlaps (stages/tiling.py assign_features_to_tiles, zooms=[{z}]).
    Tile y uses ln(tan+sec) ≡ arcsinh(tan) — identical to the engine's
    formula for the corpus's mid-latitudes."""
    n = 1 << zoom
    tile_math = (
        "CAST(floor((%(lon)s + 180.0) / 360.0 * {n}) AS BIGINT)",
        sql_qfloor(
            "(1.0 - ln(tan(radians(%(lat)s)) + 1.0"
            " / cos(radians(%(lat)s))) / pi()) / 2.0 * {n}"
        ),
    )
    tx = tile_math[0].format(n=n)
    ty = tile_math[1].format(n=n)
    return (
        "WITH %s,\n%s,\n"
        "tiles AS MATERIALIZED (\n"
        "  SELECT DISTINCT s.media_ref AS media_ref,\n"
        "         TRY_CAST(split_part(s.media_ref, '/', 1) AS BIGINT) AS tile_z,\n"
        "         TRY_CAST(split_part(s.media_ref, '/', 2) AS BIGINT) AS tile_x,\n"
        "         TRY_CAST(split_part(s.media_ref, '/', 3) AS BIGINT) AS tile_y\n"
        "  FROM (SELECT UNNEST(spans) AS s FROM read_parquet('%s'))\n"
        "  WHERE s.kind = 'tile' AND s.media_ref != ''\n"
        "),\n"
        "franges AS (\n"
        "  SELECT %s AS x0, %s AS x1, %s AS y0, %s AS y1 FROM feat\n"
        ")\n"
        "SELECT t.tile_z, t.tile_x, t.tile_y, t.media_ref,\n"
        "       (SELECT count(*) FROM franges f\n"
        "        WHERE t.tile_x BETWEEN f.x0 AND f.x1\n"
        "          AND t.tile_y BETWEEN f.y0 AND f.y1) AS n_features\n"
        "FROM tiles t WHERE t.tile_z = %d"
        % (
            _base_ctes(corpus_path),
            _themed_feature_selects(mapping),
            corpus_path,
            tx % {"lon": "minx"},
            tx % {"lon": "maxx"},
            ty % {"lat": "maxy"},  # maxy → smaller tile y
            ty % {"lat": "miny"},
            zoom,
        )
    )


def sql_tile_theme_counts(corpus_path, mapping, zoom=12):
    """Composed geospatial rollup oracle: per-(tile, theme) overlap
    counts — the tile_assignment join GROUPed over the theme carried in
    the feat CTE (only pairs with ≥1 overlap, matching the engine's
    stages/tiling.py tile_theme_counts inner semantics)."""
    n = 1 << zoom
    tx = "CAST(floor((%(lon)s + 180.0) / 360.0 * {n}) AS BIGINT)".format(n=n)
    ty = sql_qfloor(
        "(1.0 - ln(tan(radians(%(lat)s)) + 1.0"
        " / cos(radians(%(lat)s))) / pi()) / 2.0 * {n}"
    ).format(n=n)
    return (
        "WITH %s,\n%s,\n"
        "tiles AS MATERIALIZED (\n"
        "  SELECT DISTINCT\n"
        "         TRY_CAST(split_part(s.media_ref, '/', 1) AS BIGINT) AS tile_z,\n"
        "         TRY_CAST(split_part(s.media_ref, '/', 2) AS BIGINT) AS tile_x,\n"
        "         TRY_CAST(split_part(s.media_ref, '/', 3) AS BIGINT) AS tile_y\n"
        "  FROM (SELECT UNNEST(spans) AS s FROM read_parquet('%s'))\n"
        "  WHERE s.kind = 'tile' AND s.media_ref != ''\n"
        "),\n"
        "franges AS (\n"
        "  SELECT theme, %s AS x0, %s AS x1, %s AS y0, %s AS y1 FROM feat\n"
        ")\n"
        "SELECT t.tile_z, t.tile_x, t.tile_y, f.theme, count(*) AS n_features\n"
        "FROM tiles t JOIN franges f\n"
        "  ON t.tile_x BETWEEN f.x0 AND f.x1 AND t.tile_y BETWEEN f.y0 AND f.y1\n"
        "WHERE t.tile_z = %d\n"
        "GROUP BY t.tile_z, t.tile_x, t.tile_y, f.theme"
        % (
            _base_ctes(corpus_path),
            _themed_feature_selects(mapping),
            corpus_path,
            tx % {"lon": "minx"},
            tx % {"lon": "maxx"},
            ty % {"lat": "maxy"},  # maxy → smaller tile y
            ty % {"lat": "miny"},
            zoom,
        )
    )


def sql_spatial_join(
    corpus_path, mapping, left_theme="roads", right_theme="buildings", expand=0.05
):
    """Oracle for the two-layer ε-proximity bbox join: a plain SQL
    inequality join (left bboxes buffered by ``expand``) over the
    re-derived themed features — the engine's cell partitioning,
    owner-cell dedup and caps must be invisible in the result (no
    oversize/hot-cell cap fires on this corpus; if one did, the row
    sets would diverge here)."""
    e = "%.17g" % float(expand)
    return (
        "WITH %s,\n%s\n"
        "SELECT l.osm_id AS l_id, r.osm_id AS r_id\n"
        "FROM feat l JOIN feat r\n"
        "  ON l.minx - %s <= r.maxx AND r.minx <= l.maxx + %s\n"
        " AND l.miny - %s <= r.maxy AND r.miny <= l.maxy + %s\n"
        "WHERE l.theme = '%s' AND r.theme = '%s'"
        % (
            _base_ctes(corpus_path),
            _themed_feature_selects(mapping),
            e, e, e, e,
            _esc(left_theme),
            _esc(right_theme),
        )
    )


def _aoi_cover_bounds(aoi_polygons, res=DEFAULT_RES):
    """The engine's coarse cover (cells.py cover_polygon) for a rectangle
    AOI is exactly its bbox cover — verified here, then expressed as index
    BETWEEN bounds."""
    prep = PreparedPolygon(aoi_polygons)
    cover = cover_polygon(prep, res=res)
    ix = ((cover >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
    iy = (cover & np.uint64((1 << 29) - 1)).astype(np.int64)
    x0, x1, y0, y1 = ix.min(), ix.max(), iy.min(), iy.max()
    assert len(cover) == (x1 - x0 + 1) * (y1 - y0 + 1), "cover is not a full rectangle"
    return int(x0), int(x1), int(y0), int(y1)


def sql_aoi_extract(corpus_path, mapping, res=DEFAULT_RES):
    """Rectangle-AOI [0,1]² semi-join over themed features: the engine's
    coarse cell test on the bbox-center + exact tests (points: closed-rect
    status>0; lines/polygons: any resolved vertex inside the closed rect —
    exact for this corpus, whose sub-0.01° geometries cannot cross the 1°
    AOI without a vertex inside; asserted by the pytest differential)."""
    aoi = [[np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])]]
    x0, x1, y0, y1 = _aoi_cover_bounds(aoi, res=res)
    s = (1 << (res + 7)) / 360.0
    cx = "((minx + maxx) / 2.0)"
    cy = "((miny + maxy) / 2.0)"
    coarse = (
        "CAST(floor((%s + 180.0) * %.17g) AS BIGINT) BETWEEN %d AND %d "
        "AND CAST(floor((%s + 90.0) * %.17g) AS BIGINT) BETWEEN %d AND %d"
        % (cx, s, x0, x1, cy, s, y0, y1)
    )
    # vertex sets: nodes themselves; way features: their resolved node
    # coords; relation features (negative osm_id): all member-way coords
    return (
        "WITH %s,\n%s,\n"
        "wverts AS (\n"
        "  SELECT r.way_id, bool_or(n.lon BETWEEN 0 AND 1 AND n.lat BETWEEN 0 AND 1) AS any_in\n"
        "  FROM wref r JOIN nodes n ON n.id = r.ref GROUP BY r.way_id\n"
        "),\n"
        "rverts AS (\n"
        "  SELECT w.rel_id, bool_or(v.any_in) AS any_in\n"
        "  FROM rway w JOIN wverts v ON v.way_id = w.way_id GROUP BY w.rel_id\n"
        ")\n"
        "SELECT f.theme, f.osm_id, f.geom_type FROM feat f\n"
        "LEFT JOIN wverts wv ON f.geom_type IN (2, 3) AND f.osm_id > 0 AND wv.way_id = f.osm_id\n"
        "LEFT JOIN rverts rv ON f.osm_id < 0 AND rv.rel_id = -f.osm_id\n"
        "WHERE (%s)\n"
        "  AND CASE WHEN f.geom_type = 1\n"
        "           THEN f.minx BETWEEN 0 AND 1 AND f.miny BETWEEN 0 AND 1\n"
        "           ELSE coalesce(wv.any_in, rv.any_in, FALSE) END"
        % (_base_ctes(corpus_path), _themed_feature_selects(mapping), coarse)
    )

#!/usr/bin/env python3
"""Remaining-surface checklist: enumerate the public ADX/KQL docs surface
(operators / aggregations / scalar functions / evaluate plugins, frozen
below from the public learn.microsoft.com KQL reference index) against this
repo's source, so "the surface is complete except the named gaps" is a
CHECKED claim rather than an accumulated one.

For each documented name the script greps the quoted token across the KQL
surface sources (KqlPipeline / KqlCompat / Surface / functions/expressions).
Status per name:
  implemented  - the quoted name appears in the surface sources
  divergent    - implemented with a documented behavioral divergence (map)
  impossible   - adjudicated not implementable in-sandbox (map, with reason)
Anything else prints as MISSING and should be implemented or adjudicated.

Usage: python3 scripts/surface_checklist.py [--write SURFACE_CHECK.md]
Exit 1 if any MISSING remain (the gate discipline).
"""
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SOURCES = [
    ROOT / "src/main/scala/graft/kql/KqlPipeline.scala",
    ROOT / "src/main/scala/graft/functions/KqlCompat.scala",
    ROOT / "src/main/scala/graft/operators/Surface.scala",
    ROOT / "src/main/scala/graft/GraftSessionExtensions.scala",
]
EXPR_DIR = ROOT / "src/main/scala/graft/functions/expressions"

# --- the frozen public docs surface -----------------------------------------

TABULAR_OPERATORS = """
as consume count datatable distinct evaluate extend externaldata facet find
fork getschema graph-mark-components graph-match graph-shortest-paths
graph-to-table invoke join limit lookup make-graph make-series mv-apply
mv-expand order parse parse-kv parse-where partition print project
project-away project-keep project-rename project-reorder range reduce render
sample sample-distinct scan search serialize sort summarize take top
top-hitters top-nested union where
""".split()

AGGREGATION_FUNCTIONS = """
arg_max arg_min avg avgif binary_all_and binary_all_or binary_all_xor
buildschema count count_distinct count_distinctif countif covariance
covarianceif covariancep covariancepif dcount dcountif hll hll_if hll_merge
make_bag make_bag_if make_list make_list_if make_list_with_nulls make_set
make_set_if max maxif min minif percentile percentilew percentiles
percentilesw stdev stdevif stdevp sum sumif take_any take_anyif tdigest
tdigest_merge variance varianceif variancep variancepif
""".split()

EVALUATE_PLUGINS = """
active_users_count activity_counts_metrics activity_engagement
activity_metrics autocluster azure_digital_twins_query_request bag_unpack
basket cosmosdb_sql_request dcount_intersect diffpatterns diffpatterns_text
funnel_sequence funnel_sequence_completion http_request http_request_post
infer_storage_schema ipv4_lookup mysql_request narrow new_activity_metrics
pivot postgresql_request preview python rolling_percentile rows_near R
schema_merge sequence_detect session_count sliding_window_counts sql_request
""".split()

SCALAR_FUNCTIONS = """
abs acos ago around array_concat array_iff array_iif array_index_of
array_length array_reverse array_rotate_left array_rotate_right
array_shift_left array_shift_right array_slice array_sort_asc
array_sort_desc array_split array_sum asin atan atan2
base64_decode_toarray base64_decode_toguid base64_decode_tostring
base64_encode_fromarray base64_encode_fromguid base64_encode_tostring
bag_has_key bag_keys bag_merge bag_pack bag_pack_columns bag_remove_keys
bag_set_key bag_zip beta_cdf beta_inv beta_pdf bin bin_at bin_auto
binary_and binary_not binary_or binary_shift_left binary_shift_right
binary_xor bitset_count_ones case ceiling coalesce column_ifexists
convert_angle convert_energy convert_force convert_length convert_mass
convert_power convert_pressure convert_speed convert_temperature
convert_volume cos cot countof current_cluster_endpoint current_database
current_principal datetime_add datetime_diff datetime_local_to_utc
datetime_part datetime_utc_to_local dayofmonth dayofweek dayofyear dcount_hll
dcount_intersect degrees dynamic_to_json endofday endofmonth endofquarter
endofweek endofyear erf erfc estimate_data_size exp exp10 exp2 extent_id
extent_tags extract extract_all extractjson floor format_bytes
format_datetime format_ipv4 format_ipv4_mask format_timespan gamma
geo_angle geo_azimuth geo_distance_2points geo_distance_point_to_line
geo_distance_point_to_polygon geo_geohash_neighbors
geo_geohash_to_central_point geo_geohash_to_polygon geo_h3cell_children
geo_h3cell_neighbors geo_h3cell_parent geo_h3cell_rings
geo_h3cell_to_central_point geo_h3cell_to_polygon geo_info_from_ip_address
geo_intersection_2lines geo_intersection_2polygons
geo_intersection_line_with_polygon geo_intersects_2lines
geo_intersects_2polygons geo_intersects_line_with_polygon
geo_line_buffer geo_line_centroid geo_line_densify geo_line_length
geo_line_simplify geo_point_buffer geo_point_in_circle geo_point_in_polygon
geo_point_to_geohash geo_point_to_h3cell geo_point_to_s2cell
geo_polygon_area geo_polygon_buffer geo_polygon_centroid
geo_polygon_densify geo_polygon_perimeter geo_polygon_simplify
geo_polygon_to_s2cells geo_s2cell_children geo_s2cell_neighbors
geo_s2cell_parent geo_s2cell_to_central_point geo_s2cell_to_polygon
geo_simplify_polygons_array geo_union_lines_array geo_union_polygons_array
getmonth gettype getyear has_any_index has_any_ipv4 has_any_ipv4_prefix
has_ipv4 has_ipv4_prefix hash hash_combine hash_many hash_md5 hash_sha1
hash_sha256 hash_xxhash64 hourofday iff iif indexof indexof_regex
ingestion_time ipv4_compare ipv4_is_in_any_range ipv4_is_in_range
ipv4_is_match ipv4_is_private ipv4_netmask_suffix ipv4_range_to_cidr_list
ipv6_compare ipv6_is_in_any_range ipv6_is_in_range ipv6_is_match isascii
isempty isfinite isinf isnan isnotempty isnotnull isnull isutf8
jaccard_index log log10 log2 loggamma make_datetime make_string
make_timespan max_of min_of monthofyear new_guid not now pack_all
pack_array parse_command_line parse_csv parse_ipv4 parse_ipv4_mask
parse_ipv6 parse_ipv6_mask parse_json parse_path parse_url parse_urlquery
parse_user_agent parse_version parse_xml percentile_array_tdigest
percentile_tdigest percentrank_tdigest pi pow punycode_domain_from_string
punycode_domain_to_string punycode_from_string punycode_to_string radians
rand range rank_tdigest regex_quote repeat replace_regex replace_string
replace_strings reverse round series_abs series_acos series_add series_asin
series_atan series_avg series_ceiling series_cos series_cosine_similarity
series_decompose series_decompose_anomalies series_decompose_forecast
series_divide series_dot_product series_equals series_exp
series_fill_backward series_fill_const series_fill_forward
series_fill_linear series_fir series_fit_2lines series_fit_2lines_dynamic
series_fit_line series_fit_line_dynamic series_fit_poly series_floor
series_greater series_greater_equals series_ifft series_iir series_less
series_less_equals series_log series_magnitude series_max series_min
series_multiply series_not_equals series_outliers
series_pearson_correlation series_periods_detect series_periods_validate
series_pow series_product series_seasonal series_sign series_sin
series_stats series_stats_dynamic series_subtract series_sum series_tan
set_difference set_has_element set_intersect set_union sign sin split sqrt
startofday startofmonth startofquarter startofweek startofyear strcat
strcat_array strcat_delim strcmp string_size strlen strrep substring tan
tobool todatetime todecimal todouble todynamic toguid tohex toint tolong
tolower toreal tostring totimespan toupper translate treepath trim trim_end
trim_start unicode_codepoints_from_string unicode_codepoints_to_string
unixtime_microseconds_todatetime unixtime_milliseconds_todatetime
unixtime_nanoseconds_todatetime unixtime_seconds_todatetime url_decode
url_encode url_encode_component week_of_year welch_test zip
""".split()

# --- adjudications ----------------------------------------------------------

IMPOSSIBLE = {
    # name: reason (in-sandbox impossibility or external dependency)
    "azure_digital_twins_query_request": "external Azure service call; zero-egress sandbox",
    "cosmosdb_sql_request": "external CosmosDB call; zero-egress sandbox",
    "sql_request": "external SQL Server call; zero-egress sandbox",
    "mysql_request": "external MySQL call; zero-egress sandbox",
    "postgresql_request": "external PostgreSQL call; zero-egress sandbox",
    "http_request": "outbound HTTP; zero-egress sandbox",
    "http_request_post": "outbound HTTP; zero-egress sandbox",
    "python": "ADX hosted-sandbox python plugin; no per-row python runtime in the JVM engine (pyspark is driver-tooling only here)",
    "R": "ADX hosted-sandbox R plugin; no R runtime in the sandbox",
    "geo_info_from_ip_address": "needs the MaxMind GeoIP database; not in the sandbox (documented in SURVEY)",
    "geo_point_to_h3cell": "H3 tokens need 4 published arbitrary constant tables (~700 constants) absent from the sandbox — adjudicated round 11 (SURVEY 'H3 cells'); S2 family fills the hierarchical-cell role",
    "geo_h3cell_to_central_point": "H3 (see geo_point_to_h3cell)",
    "geo_h3cell_to_polygon": "H3 (see geo_point_to_h3cell)",
    "geo_h3cell_parent": "H3 (see geo_point_to_h3cell)",
    "geo_h3cell_children": "H3 (see geo_point_to_h3cell)",
    "geo_h3cell_neighbors": "H3 (see geo_point_to_h3cell)",
    "geo_h3cell_rings": "H3 (see geo_point_to_h3cell)",
    "current_cluster_endpoint": "no cluster identity in a library engine; would be a constant lie",
    "current_principal": "no auth principal in a library engine",
    "parse_user_agent": "needs the published UA device/browser database; not in the sandbox",
    "infer_storage_schema": "probes external storage blobs; zero-egress sandbox",
}

# Implemented because Spark SQL evaluates the identical name with identical
# semantics (rewrite() is a no-op on them) — each one oracle-pinned by
# q_kql_scalar_passthrough so the claim is checked, not assumed.
PASSTHROUGH = """
abs acos asin atan atan2 ceiling coalesce cos current_database dayofyear
degrees exp floor isnan isnotnull isnull log log10 log2 not pi pow radians
reverse round sign sin sqrt tan
""".split()

DIVERGENT = {
    # name: documented divergence (implemented, behavior differs at the operator)
    "reduce": "deterministic prefix/suffix grouping instead of ADX's opaque similarity heuristic (documented at the operator)",
    "autocluster": "deterministic attribute-subset mining instead of ADX's proprietary heuristic (documented)",
    "diffpatterns": "deterministic variant of the proprietary heuristic (documented)",
    "geo_line_buffer": "offset-curve construction; collinear/tangency degeneracies documented (GeoBuffer.scala)",
    "geo_polygon_buffer": "offset-curve construction (GeoBuffer.scala)",
    "geo_simplify_polygons_array": "per-ring simplify; ADX preserves shared borders (documented at the operator)",
    "rand": "Spark-seeded deterministic stream, not ADX's nondeterministic rand (oracle requires determinism)",
    "new_guid": "deterministic UUID from a seeded stream (oracle requires determinism)",
    "has_any_ipv4_prefix": "a single BARE-IDENTIFIER prefix arg is taken as a dynamic-array "
        "column (the common ADX shape); a scalar string COLUMN as the one prefix must be "
        "spelled pack_array(col) — the textual rewrite cannot see column types, and both "
        "misreadings fail analysis loudly (KqlCompat.scala, r13 advice / r14 review)",
    # round-12 straggler batch (q_kql_scalar/dynamic/geo_stragglers pins)
    "gettype": "STATIC column type mapped to KQL names, not ADX's per-row dynamic probe (documented at the expansion)",
    "estimate_data_size": "per-type width heuristic (strings by bytes, dynamics by serialized text); ADX's estimate is engine-specific too",
    "bin_auto": "query_bin_auto_size binds as a column/let, not a query property (no query-property plane in a library engine)",
    "isutf8": "JVM strings are definitionally valid — true iff non-null",
    "url_encode": "Spark form-encoding: '+' for space and UPPERCASE hex (ADX prints lowercase) — spelling divergence only",
    "series_fit_line": "tuple multi-assignment form not supported; use series_fit_line_dynamic (same fit, bag output)",
    "series_fit_2lines": "tuple multi-assignment form not supported; use series_fit_2lines_dynamic",
    "series_stats": "tuple multi-assignment form not supported; use series_stats_dynamic",
    "series_periods_validate": "scores via the detector's normalized autocorrelation, not ADX's FFT scorer (same contract)",
    "extent_id": "mirror-plane analog: the MLK_BlobPath lineage column (MirrorTable) — no Kusto extent identity in a lake engine",
    "extent_tags": "mirror-plane analog: add.tags through the checkpoint fold (MirrorTable.liveFiles)",
    "ingestion_time": "mirror-plane analog: the MLK_IngestTs column stamped at staging",
    "geo_angle": "angle convention documented at the expansion: CW at p2 from ray p2->p1 to ray p2->p3 in [0, 2pi)",
    "geo_union_lines_array": "vertex-identical duplicates collapse; PARTIAL overlaps are not dissolved (the clipper's documented collinear-overlap divergence class)",
    "percentrank_tdigest": "fraction [0,1] = rank_tdigest/100 (the pair's percentage read scaled)",
}

# names whose registration token differs from the docs name
_CASTS = 'for (t <- Seq("string", "int", "long", "double", "bool", "real", "decimal"))'
ALIASES = {
    "percentiles": '"percentile"',   # multi-arg form of the same expansion
    "ago": "ago\\\\(",           # regex-rewritten (ago(1d) -> interval)
    # the to* cast family expands via one dynamic loop in KqlCompat
    "tobool": _CASTS, "todecimal": _CASTS, "todouble": _CASTS,
    "toint": _CASTS, "tolong": _CASTS, "toreal": _CASTS, "tostring": _CASTS,
}


def _check_disjoint():
    overlaps = (set(PASSTHROUGH) & set(DIVERGENT)) | \
        (set(PASSTHROUGH) & set(IMPOSSIBLE)) | (set(DIVERGENT) & set(IMPOSSIBLE))
    if overlaps:
        sys.exit(f"FATAL: adjudication maps overlap (a name belongs to exactly one): {sorted(overlaps)}")


def grep_hit(name: str, haystack: str) -> bool:
    token = ALIASES.get(name)
    if token is not None:
        return token in haystack
    # REGISTRATION shapes only — a docs name that merely appears inside some
    # other handler's emitted string (a rewrite-table VALUE or an error
    # message) must not count as implemented (r12 advice):
    #   "foo" ->               map key (rewrite table / registry / dispatch)
    #   "foo(" ->              call-prefix rewrite-table key
    #   case "foo"             match-arm dispatch
    #   case Seq("foo", ...)   "
    #   expandCalls(s, "foo")  expansion registration
    #   expandAgg*( ... "foo") aggregate-expansion registration
    #   == "foo" / != "foo"    name-comparison dispatch (pipeline stages)
    #   startsWith("foo ")     operator-prefix dispatch
    q = re.escape(name)
    shapes = [
        rf'"{q}"\s*(->|=>)',
        rf'"{q}\("\s*(->|=>)',
        rf'case\s+"{q}"',
        rf'case\s+Seq\(\s*"{q}"',
        rf'expandCalls\(\s*\w+\s*,\s*"{q}"\s*[,)]',
        rf'expand\w*\(\s*\w+\s*,\s*"{q}"\s*[,)]',
        rf'[=!]=\s*"{q}"',
        rf'"{q}"\s*[=!]=',
        rf'startsWith\("{q}[ ("]',
        rf'indexOf\("{q}"',
        # GraftSessionExtensions registration helpers:
        #   unary("name", classOf[...], ...) / binary(...) and the
        #   ("name", Mk(_), classOf[Mk]) tuple batches
        rf'(unary|binary)\("{q}"',
        rf'\("{q}",\s*[A-Z]\w*\(',
        rf'FunctionIdentifier\("{q}"\)',
    ]
    return any(re.search(p, haystack) for p in shapes)


def main() -> int:
    _check_disjoint()
    hay = "".join(p.read_text() for p in SOURCES)
    hay += "".join(p.read_text() for p in EXPR_DIR.glob("*.scala"))

    groups = [
        ("Tabular operators", TABULAR_OPERATORS),
        ("Aggregation functions", AGGREGATION_FUNCTIONS),
        ("Evaluate plugins", EVALUATE_PLUGINS),
        ("Scalar functions", SCALAR_FUNCTIONS),
    ]
    lines = ["# SURFACE_CHECK — ADX docs surface vs graft registry",
             "",
             "Generated by scripts/surface_checklist.py (frozen public docs list",
             "embedded there). Statuses: implemented / divergent (implemented,",
             "documented behavioral divergence) / impossible (adjudicated, with",
             "reason) / MISSING (to implement or adjudicate).", ""]
    missing_total = []
    for title, names in groups:
        impl, div, imp, missing = [], [], [], []
        for n in sorted(set(names)):
            if n in IMPOSSIBLE:
                imp.append(n)
            elif n in PASSTHROUGH:
                impl.append(n)
            elif n in DIVERGENT:
                div.append(n)
            elif grep_hit(n, hay):
                impl.append(n)
            else:
                missing.append(n)
        lines.append(f"## {title}: {len(impl)} implemented, "
                     f"{len(div)} divergent, {len(imp)} impossible, "
                     f"{len(missing)} missing")
        lines.append("")
        if div:
            lines.append("Divergent:")
            for n in div:
                lines.append(f"- `{n}` — {DIVERGENT[n]}")
            lines.append("")
        if imp:
            lines.append("Impossible in-sandbox:")
            for n in imp:
                lines.append(f"- `{n}` — {IMPOSSIBLE[n]}")
            lines.append("")
        if missing:
            lines.append("MISSING:")
            for n in missing:
                lines.append(f"- `{n}`")
            lines.append("")
        missing_total += missing
    out = "\n".join(lines) + "\n"
    if len(sys.argv) > 1 and sys.argv[1] == "--write":
        (ROOT / sys.argv[2]).write_text(out)
        print(f"wrote {sys.argv[2]}")
    else:
        print(out)
    if missing_total:
        print(f"{len(missing_total)} MISSING: {' '.join(missing_total)}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

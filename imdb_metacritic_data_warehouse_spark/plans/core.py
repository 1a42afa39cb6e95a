"""Core-layer (silver / Data Vault) builders.

Each function is the Spark-first re-expression of one reference script
(the canonical SQL embedded in ``ddl.py:67-377``; readable copies in
``core/*.sql``).  Builders return the *snapshot* DataFrame — the merge
layer (operators/scd2.py) historizes it.

Scale notes common to all builders:
- Unions are ``UNION`` in PG (deduplicating) → explicit ``.distinct()``
  after ``unionByName`` (SURVEY.md U1); Catalyst plans this as one
  hash-aggregate over the union — a single shuffle on all columns.
- Hub joins are equi-joins on md5 keys — uniform, skew-free; hubs are
  dimension-sized so AQE auto-broadcasts them.  We add an explicit
  ``F.broadcast`` only on genre_hub (guaranteed tiny: distinct genre
  names), and let AQE decide for movie/employee hubs, which could be
  large in a 100 TB deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import hash_key
from ..functions.parsing import explode_genres_json, explode_genres_split


def known_distinct(wh, key: tuple[str, str], cols: set[str]) -> bool:
    """Caller-declared uniqueness hint — the warehouse-level analogue of
    a PK/UNIQUE constraint, which Spark has no way to infer.

    A caller that KNOWS a table is already distinct on ``cols`` (e.g. a
    pre-deduplicated shared bronze projection, or a freshly bootstrapped
    SCD2 table whose key is one-row-per-key by construction) registers
    ``wh.distinct_hints[(schema, table)] = {frozenset(cols), ...}``;
    builders then elide the corresponding DISTINCT — a full-width
    shuffle of the table — because ``distinct`` of an
    already-distinct set is the identity.  At 100 TB a redundant
    all-columns exchange over a fact-sized frame is one of the largest
    avoidable costs in a vault load, and real warehouses solve it
    exactly this way (declared constraints driving dedup elimination).
    With no hint registered, behavior is unchanged.
    """
    hints = getattr(wh, "distinct_hints", None)
    return bool(hints) and frozenset(cols) in hints.get(key, set())


def _movie_raw_union(wh, cols: dict[str, F.Column | str]) -> DataFrame:
    """UNION (dedup) of the two movie raw tables over a projection."""
    parts = []
    for tab in ("movie_raw_data_imdb", "movie_raw_data_metacritic"):
        df = wh.bronze(tab)
        parts.append(df.select(*[(v if not isinstance(v, str) else F.col(v)).alias(k) for k, v in cols.items()]))
    return parts[0].unionByName(parts[1]).distinct()


def build_genre_hub(wh) -> DataFrame:
    """``core/genre_hub.sql``: UNION ALL both sources' ``genres``
    strings → bracket-strip/split/quote-strip explode (parse variant 1)
    → distinct → md5 key."""
    imdb = wh.bronze("movie_raw_data_imdb").select("genres")
    meta = wh.bronze("movie_raw_data_metacritic").select("genres")
    combined = imdb.unionByName(meta)  # UNION ALL (core/genre_hub.sql:13)
    genres = (
        combined.select(F.explode(explode_genres_split(F.col("genres"))).alias("genre"))
        .distinct()
    )
    return genres.select(
        F.md5(F.col("genre")).alias("genre_id"), F.col("genre").alias("genre_nm")
    )


def build_employee_hub(wh) -> DataFrame:
    """``core/employee_hub.sql``: UNION (dedup) both actor raws, then
    distinct ``md5(name), name``.  No null filter in the reference —
    a NULL name yields one NULL-key row, preserved."""
    a = wh.bronze("actor_raw_data_imdb")
    b = wh.bronze("actor_raw_data_metacritic")
    return (
        a.unionByName(b)
        .select(F.col("name"))
        .distinct()
        .select(F.md5("name").alias("emp_id"), F.col("name").alias("emp_nm"))
    )


def build_movie_hub(wh) -> DataFrame:
    """``core/movie_hub.sql``: union-dedup of (name, duration) from both
    movie raws; key ``md5(movie_nm||movie_duration)``; drop NULL keys."""
    t = _movie_raw_union(
        wh,
        {
            "movie_nm": "movie_name",
            "movie_duration": F.col("min_duration").cast("int"),
        },
    )
    return (
        t.select(
            hash_key("movie_nm", "movie_duration").alias("movie_id"),
            "movie_nm",
            "movie_duration",
        )
        .filter(F.col("movie_id").isNotNull())
        .distinct()
    )


def build_movie_info_sat(wh) -> DataFrame:
    """``core/movie_info_sat.sql``: per-source attribute rows tagged with
    a literal ``scr_nm``, joined to the hub **on the recomputed hash**
    (``md5(movie_name||duration) = movie_id``, the reference's
    hub-bypass quirk, SURVEY.md §2.12); sat key ``md5(movie_id||url)``."""
    parts = []
    for tab, tag in (("movie_raw_data_imdb", "IMDB"), ("movie_raw_data_metacritic", "METACRITIC")):
        df = wh.bronze(tab)
        parts.append(
            df.select(
                "movie_name",
                F.col("min_duration").cast("int").alias("duration"),
                "original_name",
                "year",
                "certificate",
                "rating",
                "budget",
                "gross_worldwide",
                F.lit(tag).alias("scr_nm"),
                "url",
            ).distinct()
        )
    films = parts[0].unionByName(parts[1]).distinct()
    hub = wh.read("stg", "movie_hub").select("movie_id")
    with_id = films.join(
        hub, hash_key(films.movie_name, films.duration) == hub.movie_id, "inner"
    )
    return with_id.select(
        hash_key("movie_id", "url").alias("title_item_id"),
        "movie_id",
        "original_name",
        "year",
        "certificate",
        "rating",
        "budget",
        "gross_worldwide",
        "scr_nm",
        "url",
    ).distinct()


def build_movie_genre_link(wh) -> DataFrame:
    """``core/movie_genre_link.sql``: explode genres via the JSON parse
    (variant 2), union-dedup, join movie_hub on the composite natural
    key and genre_hub on name; key ``md5(movie_id||genre_id)``."""
    parts = []
    for tab in ("movie_raw_data_imdb", "movie_raw_data_metacritic"):
        df = wh.bronze(tab)
        parts.append(
            df.select(
                F.col("movie_name").alias("movie_nm"),
                F.col("min_duration").cast("int").alias("duration"),
                F.explode(explode_genres_json(F.col("genres"))).alias("genre"),
            )
        )
    exploded = parts[0].unionByName(parts[1]).distinct()
    hub = wh.read("stg", "movie_hub")
    genres = wh.read("stg", "genre_hub")
    joined = exploded.join(
        hub,
        (exploded.movie_nm == hub.movie_nm) & (exploded.duration == hub.movie_duration),
        "inner",
    ).join(F.broadcast(genres), exploded.genre == genres.genre_nm, "inner")
    return joined.select(
        hash_key(hub.movie_id, genres.genre_id).alias("mv_gen_link_id"),
        hub.movie_id.alias("movie_id"),
        genres.genre_id.alias("genre_id"),
    ).distinct()


def build_movie_emp_link(wh) -> DataFrame:
    """``core/movie_emp_link.sql``: union-dedup (movie, duration, name)
    from actor raws; derive both hash keys; require membership in both
    hubs; key ``md5(movie_id||emp_id)``."""
    a = wh.bronze("actor_raw_data_imdb")
    b = wh.bronze("actor_raw_data_metacritic")
    t1 = a.select(
        F.col("movie_name").alias("movie_nm"),
        F.col("movie_duration").cast("int").alias("duration"),
        "name",
    ).unionByName(
        b.select(
            F.col("movie_name").alias("movie_nm"),
            F.col("movie_duration").cast("int").alias("duration"),
            "name",
        )
    )
    if not known_distinct(
        wh, ("bronze", "actor_union"), {"movie_name", "movie_duration", "name"}
    ):
        t1 = t1.distinct()
    t2 = t1.select(
        hash_key("movie_nm", "duration").alias("movie_id"),
        F.md5("name").alias("emp_id"),
    ).filter(F.col("movie_id").isNotNull())
    emp_hub = wh.read("stg", "employee_hub").select("emp_id")
    movie_hub = wh.read("stg", "movie_hub").select("movie_id")
    joined = (
        t2.join(emp_hub, "emp_id", "inner")
        .join(movie_hub, "movie_id", "inner")
    )
    out = joined.select(
        hash_key("movie_id", "emp_id").alias("movie_emp_link_id"),
        "movie_id",
        "emp_id",
    )
    # Output dedup elidable when (a) t1 was distinct on its 3-col grain
    # (md5 keys are then injectively derived → pairs distinct) and (b)
    # both hub membership probes are declared unique on their keys
    # (joins preserve cardinality) — the link set is already distinct.
    if not (
        known_distinct(wh, ("bronze", "actor_union"), {"movie_name", "movie_duration", "name"})
        and known_distinct(wh, ("stg", "employee_hub"), {"emp_id"})
        and known_distinct(wh, ("stg", "movie_hub"), {"movie_id"})
    ):
        out = out.distinct()
    return out


def build_emp_movie_l_sat(wh) -> DataFrame:
    """``core/emp_movie_l_sat.sql``: union-dedup full actor rows, derive
    link key ``md5(md5(movie||dur)||md5(name))``, keep rows whose link
    exists in stg.movie_emp_link; sat key
    ``md5(link_id||raw_role||role)``; ``raw_role`` becomes
    ``description``."""
    a = wh.bronze("actor_raw_data_imdb")
    b = wh.bronze("actor_raw_data_metacritic")
    t1 = a.select(
        "movie_name",
        F.col("movie_duration").cast("int").alias("dur"),
        "name",
        "raw_role",
        "role",
    ).unionByName(
        b.select(
            "movie_name",
            F.col("movie_duration").cast("int").alias("dur"),
            "name",
            "raw_role",
            "role",
        )
    )
    # UNION-dedup: elidable (identity) when the caller declared the
    # actor union pre-distinct on exactly this grain — saves a
    # full-width shuffle of the fact-sized frame (see known_distinct).
    if not known_distinct(
        wh,
        ("bronze", "actor_union"),
        {"movie_name", "movie_duration", "name", "raw_role", "role"},
    ):
        t1 = t1.distinct()
    t3 = t1.select(
        hash_key(hash_key("movie_name", "dur"), F.md5("name")).alias("link_id"),
        "raw_role",
        "role",
    )
    # (link_id, raw_role, role) is an injective image of the 3-col
    # grain (link_id determines (movie, dur, name) under md5), so t3 is
    # already distinct whenever the actor union was distinct on it.
    t3_distinct = known_distinct(
        wh, ("bronze", "actor_union"), {"movie_name", "movie_duration", "name"}
    )
    if not t3_distinct:
        t3 = t3.distinct()
    links = wh.read("stg", "movie_emp_link").select("movie_emp_link_id")
    links_unique = known_distinct(
        wh, ("stg", "movie_emp_link"), {"movie_emp_link_id"}
    )
    if not links_unique:
        links = links.distinct()
    joined = t3.join(links, t3.link_id == links.movie_emp_link_id, "inner")
    out = joined.select(
        hash_key("movie_emp_link_id", "raw_role", "role").alias("movie_emp_role_id"),
        "movie_emp_link_id",
        F.col("raw_role").alias("description"),
        "role",
    )
    # distinct t3 x unique links → joined (and its injective projection)
    # is already a set; the output dedup shuffle is then the identity.
    if not (t3_distinct and links_unique):
        out = out.distinct()
    return out

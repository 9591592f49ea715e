"""r12 mutation batteries for the two remaining parse surfaces the r10/r11
fuzz waves had not covered: the TTN envelope JSON layer (sources/ttn.py +
the streaming dead-letter accounting) and the station CSV reader
(sources/stations.py). Pattern follows the r10 XLSX/LoRa batteries:
seeded deterministic mutations, ONE Spark pass over the whole corpus,
and the contract is 'quarantine, never kill the batch' — a single
malformed line must never throw (the r12 battery caught exactly that:
ANSI-mode CAST_INVALID_INPUT batch kills from a garbage time string and
a garbage airtime duration — fixed with try_to_timestamp/try_cast)."""

from __future__ import annotations

import json
import random

import pytest


def _mutated_ttn_lines(n_byte: int, n_struct: int, n_garbage: int) -> list[str]:
    from tests.fixtures_mqtt import ALL_LINES

    rng = random.Random(0xDA7A12)
    lines: list[str] = []
    # byte-level: flips / truncations / splices of real dump lines
    for _ in range(n_byte):
        base = bytearray(rng.choice(ALL_LINES).encode())
        mode = rng.randrange(3)
        if mode == 0:
            for _ in range(rng.randint(1, 6)):
                base[rng.randrange(len(base))] = rng.randrange(32, 127)
        elif mode == 1:
            base = base[: rng.randrange(len(base))]
        else:
            i = rng.randrange(len(base))
            junk = bytes(rng.randrange(32, 127) for _ in range(rng.randint(1, 12)))
            base = base[:i] + junk + base[i:]
        lines.append(base.decode("latin-1"))
    # structural: mutate parsed envelope fields (the ANSI hazard tier)
    poisons = [
        "garbage-time", "junk", "1e999", "-", "", "0.061696s", "NaNs",
        1 << 80, -(1 << 80), 3.14, True, None, [], {}, {"x": 1}, ["y"],
        "2020-13-45T99:99:99Z", "\x00\xff", "999999999999999999999999999",
    ]
    for _ in range(n_struct):
        line = rng.choice(ALL_LINES)
        env = json.loads(line[line.index("{"):])

        def mutate(node, depth=0):
            if not isinstance(node, dict) or depth > 3:
                return
            keys = list(node)
            if not keys:
                return
            k = rng.choice(keys)
            act = rng.randrange(3)
            if act == 0:
                del node[k]
            elif act == 1:
                node[k] = rng.choice(poisons)
            elif isinstance(node[k], dict):
                mutate(node[k], depth + 1)
            else:
                node[k] = rng.choice(poisons)

        for _ in range(rng.randint(1, 4)):
            mutate(env)
        lines.append("topic/up " + json.dumps(env))
    # raw garbage
    for _ in range(n_garbage):
        lines.append(
            "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(0, 80)))
        )
    return lines


def test_ttn_envelope_mutation_battery(spark):
    """4500-line battery over parse_envelopes + the full dead-letter
    accounting: (a) NOTHING throws — not the envelope parse, not the
    port/payload decode tier behind all_dead_letters (a single bad line
    killing the batch is the failure mode this battery exists for);
    (b) the golden lines still normalize to exactly the same rows as
    when parsed alone (mutations cannot poison neighbors — per-row
    expressions only); (c) accounting is total: every non-blank line is
    either a normalized record or an envelope dead letter, never
    silently dropped."""
    from mysense_spark.sources.ttn import parse_envelopes
    from mysense_spark.streaming.pipeline import all_dead_letters, envelope_dead_letters
    from tests.fixtures_mqtt import ALL_LINES

    mutated = _mutated_ttn_lines(n_byte=2000, n_struct=2000, n_garbage=500)
    corpus = ALL_LINES + mutated
    lines = spark.createDataFrame([(ln,) for ln in corpus], "value string")

    parsed = parse_envelopes(lines)
    rows = parsed.collect()  # (a) must not throw
    dead = envelope_dead_letters(lines).collect()
    all_dead_letters(lines).collect()  # decode tier: also must not throw

    # (b) golden lines unaffected by the mutated neighbors
    golden_alone = parse_envelopes(
        spark.createDataFrame([(ln,) for ln in ALL_LINES], "value string")
    ).drop("ingest_ts", "event_ts")
    golden_keys = {
        (r["app_id"], r["dev_id"], r["port"], r["counter"], r["payload_raw"])
        for r in golden_alone.collect()
    }
    batch_keys = {
        (r["app_id"], r["dev_id"], r["port"], r["counter"], r["payload_raw"])
        for r in rows
    }
    assert golden_keys <= batch_keys

    # (c) total accounting
    n_nonblank = sum(1 for ln in corpus if ln.strip())
    assert len(rows) + len(dead) == n_nonblank
    # every normalized row carries identity by construction
    for r in rows[:50]:
        assert r["app_id"] is not None or r["dev_id"] is not None


def test_ttn_ansi_hazard_regressions(spark):
    """The two batch-killers the r12 battery surfaced, pinned as
    explicit regressions: a V2 envelope whose metadata.time is not a
    timestamp, and a V3 envelope whose settings.airtime is not a
    duration. Both must normalize (event_ts falls back per the
    documented semantics) instead of throwing CAST_INVALID_INPUT."""
    from mysense_spark.sources.ttn import parse_envelopes

    cases = [
        {"app_id": "a", "dev_id": "d", "port": 2, "payload_raw": "AAA=",
         "metadata": {"time": "garbage-time"}},
        {"end_device_ids": {"device_id": "d",
                            "application_ids": {"application_id": "a"}},
         "uplink_message": {"f_port": 2, "frm_payload": "AAA=",
                            "settings": {"airtime": "junk"},
                            "received_at": "2024-01-01T00:00:00Z"}},
        {"app_id": "a", "dev_id": "d",
         "uplink_message": {"settings": {"airtime": "1e999s"}}},
        # r12 review catch: an airtime near LONG_MIN passes try_cast (it
        # IS a bigint) and the plain subtraction overflowed under ANSI
        {"app_id": "a", "dev_id": "d", "port": 2, "payload_raw": "AAA=",
         "metadata": {"time": "2024-01-01T00:00:00Z"},
         "uplink_message": {"settings": {"airtime": "-9223372036854s"}}},
    ]
    df = spark.createDataFrame([(json.dumps(c),) for c in cases], "value string")
    rows = parse_envelopes(df).collect()
    assert len(rows) == len(cases)
    for r in rows:
        assert r["event_ts"] is not None  # fallback, never NULL or throw


def test_station_csv_mutation_battery(spark, tmp_path):
    """Station CSV reader battery: one scan over ~2000 mutated rows +
    50 clean rows; the PERMISSIVE schema path must (a) never throw,
    (b) quarantine every type-corrupt row into _corrupt with the raw
    line preserved (replay contract), (c) parse the clean rows with
    correct types, and (d) account for every data line — parsed or
    quarantined, never dropped."""
    from mysense_spark.sources.stations import read_station_csv

    rng = random.Random(0x57A710)
    clean = [
        f"S{i % 7},2024-01-01T{i % 24:02d}:00:00,{10 + i % 5}.5,{20 + i % 9}.25,,"
        for i in range(50)
    ]
    # no bare double-quote and no blank-line mutations here: an
    # unbalanced quote legitimately MERGES following lines (RFC 4180
    # multiline fields) and blank lines are skipped by the CSV reader —
    # both are parser-correct, so they get their own pinned case below
    # while this battery keeps exact line accounting
    poisons = ["garbage", "9e999", "--", "1;2;3", "\x00", "NaNish", "1e1e1"]
    mutated = []
    for i in range(2000):
        mode = rng.randrange(3)
        if mode == 0:  # type poison in one typed column
            cols = [f"S{i}", "2024-01-01T00:00:00", "1.0", "2.0", "", ""]
            cols[rng.randrange(1, 6)] = rng.choice(poisons)
            mutated.append(",".join(cols))
        elif mode == 1:  # wrong arity
            row = ",".join(rng.choice(poisons) for _ in range(rng.randint(1, 9)))
            # a LONE NUL line is skipped like a blank (univocity's null
            # char) — pinned in the semantics test; keep accounting exact
            mutated.append(row if row != "\x00" else "x,\x00")
        else:  # byte-flipped clean row (quotes re-flipped away)
            b = bytearray(rng.choice(clean).encode())
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(32, 127)
            mutated.append(b.decode("latin-1").replace('"', "'") or "x")
    path = tmp_path / "stations.csv"
    header = "station_id,ts,pm25,pm10,no2,o3"
    path.write_text("\n".join([header] + clean + mutated) + "\n")

    df = read_station_csv(spark, str(path))
    rows = df.collect()  # (a) one scan, no throw
    n_data = len(clean) + len(mutated)
    assert len(rows) == n_data  # (d) nothing dropped
    n_corrupt = sum(1 for r in rows if r["_corrupt"] is not None)
    n_parsed_clean = sum(
        1
        for r in rows
        if r["_corrupt"] is None and r["station_id"] is not None and r["ts"] is not None
    )
    # (c) at least every clean row parses typed
    assert n_parsed_clean >= len(clean)
    # (b) the corrupt rows kept their raw line
    for r in rows:
        if r["_corrupt"] is not None:
            assert isinstance(r["_corrupt"], str) and r["_corrupt"]
    # the battery must actually exercise the quarantine path
    assert n_corrupt > 100


def test_rest_page_mutation_battery(spark):
    """Late-r12 battery for the REST/SensorThings page surface
    (sources/rest.py) — the last uncovered parse surface: 3000 pages of
    poisoned transport bodies (random bytes, truncated JSON, non-object
    payloads, non-list 'value', non-object rows, wrong-typed cells,
    huge/inf numbers, malformed timestamps) mixed with the golden
    paging fixture. Contract: (a) read_paginated and the
    observations_frame tail never throw — one rotten page must cost
    that page, not the export (the Arrow-conversion twin of the ANSI
    batch-killer class); (b) golden pages still yield exactly their
    rows; (c) rest_dead_pages accounting is total — its per-page n_rows
    sums to what read_paginated actually produced, and every page
    carries a reason or rows; (d) wrong-typed cells null out
    (quarantine, don't guess: JSON true in a double field is NOT 1.0);
    (e) rows whose phenomenonTime cannot parse are dropped by
    observations_frame, not fatal."""
    import math

    from mysense_spark.operators.ingest import (
        _fake_sensorthings_fetch,
        _ST_N_OBS,
        _ST_PAGE,
        _st_obs,
    )
    from mysense_spark.sources.rest import (
        observations_frame,
        read_paginated,
        rest_dead_pages,
    )

    rng = random.Random(0x5E57)
    n_clean = 5  # the golden fixture's pages (4 data + 1 past-the-end)
    clean_bodies = {
        p: _fake_sensorthings_fetch(
            f"x?$top={_ST_PAGE}&$skip={p * _ST_PAGE}"
        )
        for p in range(n_clean)
    }
    good_row = dict(_st_obs(0))

    def poison_body(i: int) -> str:
        mode = rng.randrange(9)
        if mode == 0:  # raw garbage
            return "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(0, 60)))
        if mode == 1:  # truncated JSON of a real page
            b = clean_bodies[rng.randrange(4)]
            return b[: rng.randrange(len(b))]
        if mode == 2:  # JSON, wrong envelope shape
            return rng.choice(["[]", '"str"', "42", "null", '{"value": 42}', '{"value": {"a": 1}}'])
        if mode == 3:  # value list with non-object entries around a good row
            return json.dumps({"value": [42, "x", None, [], good_row, True]})
        if mode == 4:  # wrong-typed cells
            return json.dumps({"value": [
                {"station": 17, "phenomenonTime": True, "result": "abc"},
                {"station": ["l"], "phenomenonTime": {"t": 1}, "result": False},
            ]})
        if mode == 5:  # huge / non-finite numbers
            return json.dumps({"value": [
                {"station": "SX", "phenomenonTime": "2024-01-01T00:00:00Z", "result": 1 << 80},
            ]}).replace("}]}", '},{"station":"SY","phenomenonTime":"2024-01-01T01:00:00Z","result":Infinity}]}')
        if mode == 6:  # malformed timestamp (parses as a row, dies at ts)
            return json.dumps({"value": [
                {"station": "ST", "phenomenonTime": "not-a-time", "result": 1.0},
            ]})
        if mode == 7:  # OData error envelope / value-less object (r13
            # advice catch: these used to count as healthy-and-empty)
            return rng.choice([
                json.dumps({"error": {"code": 429, "message": "rate limit"}}),
                json.dumps({"@iot.count": 0}),
            ])
        return ""  # empty body

    n_pages = 3000
    bodies = dict(clean_bodies)
    for p in range(n_clean, n_pages):
        bodies[p] = poison_body(p)

    def fetch(url: str) -> str:
        import re as _re

        skip = int(_re.search(r"\$skip=(\d+)", url).group(1))
        return bodies[skip // _ST_PAGE]

    kw = dict(base_url="https://x/v1.1", entity="Observations", n_pages=n_pages,
              page_size=_ST_PAGE)
    raw = read_paginated(
        spark, fetch, schema="station string, phenomenonTime string, result double",
        select=["station", "phenomenonTime", "result"], **kw,
    )
    rows = raw.collect()  # (a) no throw
    obs = observations_frame(raw, key_cols=("station",)).collect()  # (a) tail too

    # (b) golden rows all present with exact values
    golden = {(o["station"], o["phenomenonTime"], o["result"])
              for o in (_st_obs(i) for i in range(_ST_N_OBS))}
    got = {(r["station"], r["phenomenonTime"], r["result"]) for r in rows}
    assert golden <= got

    # (c) total accounting against the audit twin
    audit = rest_dead_pages(spark, fetch, **kw).collect()
    assert len(audit) == n_pages
    assert sum(a["n_rows"] for a in audit) == len(rows)
    for a in audit:
        assert a["reason"] in (None, "empty", "bad_json", "bad_envelope", "error_body")
    reasons = {a["reason"] for a in audit}
    # battery bites: incl. the r13 error-envelope class — a rate-limit
    # body must carry a reason, never read as a healthy empty page
    assert {"bad_json", "bad_envelope", "empty", "error_body"} <= reasons
    # a good page never carries BOTH no reason and no rows unless it
    # truly served an empty value list — every value-less object now
    # has a reason
    for a in audit:
        if a["reason"] is None:
            assert a["n_rows"] > 0 or a["n_bad_rows"] > 0 or a["page"] < n_clean
    assert sum(a["n_bad_rows"] for a in audit) > 100

    # (d) wrong-typed cells quarantined to null, never guessed
    assert not any(isinstance(r["station"], str) and r["station"] == "17" for r in rows)
    assert not any(r["result"] == 1.0 and r["station"] is None and r["phenomenonTime"] is True for r in rows)
    typed_bad = [r for r in rows if r["station"] is None and r["phenomenonTime"] is None
                 and r["result"] is None]
    assert typed_bad  # the all-poison row survived as all-null
    # inf is a representable double, not a quarantine case
    assert any(r["result"] is not None and math.isinf(r["result"]) for r in rows)

    # (e) malformed timestamps dropped by the tail, silently and safely
    assert not any(r["station"] == "ST" for r in obs)
    assert any(r["station"] == "NL10131" for r in obs)


def test_rest_numeric_edge_regressions(spark):
    """The two numeric batch-killers the late-r12 review surfaced,
    pinned: (a) a JSON integer too large for float64 (400 digits) in a
    double OR long column must quarantine to null, not raise
    OverflowError out of pandas' column inference and kill the export
    (the first battery only reached 2^80, which FITS in float64);
    (b) a long column holding 2^53+1 next to a quarantined cell must
    keep the exact integer — the nullable-int build must never round
    the good values through float64 (repro: 9007199254740993 came back
    ...992)."""
    from mysense_spark.sources.rest import read_paginated

    huge = int("9" * 400)
    body = json.dumps({"value": [
        {"s": "a", "d": huge, "l": huge},
        {"s": "b", "d": 1.5, "l": 9007199254740993},
        {"s": "c", "d": 2.0, "l": "bad"},
    ]})

    def fetch(url: str) -> str:
        return body

    rows = read_paginated(
        spark, fetch, "https://x", "E", n_pages=1,
        schema="s string, d double, l long",
    ).collect()
    by_s = {r["s"]: r for r in rows}
    assert by_s["a"]["d"] is None and by_s["a"]["l"] is None  # (a)
    assert by_s["b"]["l"] == 9007199254740993  # (b) exact, no float trip
    assert by_s["b"]["d"] == 1.5
    assert by_s["c"]["l"] is None  # the quarantined neighbor

    # (c) decimal columns keep EXACT integers beyond 2^53 (second
    # review pass: the DecimalType-as-double rule re-introduced the
    # float64 rounding for decimals) and still quarantine the
    # overflow/float-crash classes
    body2 = json.dumps({"value": [
        {"s": "a", "big": 9007199254740993, "amt": 1.25},
        {"s": "b", "big": huge, "amt": True},
        {"s": "c", "big": "bad", "amt": 2.125},
    ]})
    rows2 = read_paginated(
        spark, lambda url: body2, "https://x", "E", n_pages=1,
        schema="s string, big decimal(20,0), amt decimal(10,2)",
    ).collect()
    by2 = {r["s"]: r for r in rows2}
    assert int(by2["a"]["big"]) == 9007199254740993  # exact decimal
    assert float(by2["a"]["amt"]) == 1.25
    assert by2["b"]["big"] is None and by2["b"]["amt"] is None
    assert by2["c"]["big"] is None
    assert float(by2["c"]["amt"]) == 2.12  # half-even to scale 2

    # (d) JSON NaN (nonstandard literal json.loads accepts) quarantines
    # to null in a double column — pinned EXPLICITLY (r13 advice catch:
    # Arrow's pandas-null-sentinel handling collapses NaN to null no
    # matter what, so _dbl_cell now quarantines it by contract instead
    # of claiming it survives); +/-inf still pass as real doubles
    body3 = '{"value": [{"s": "n", "d": NaN}, {"s": "i", "d": Infinity}]}'
    rows3 = read_paginated(
        spark, lambda url: body3, "https://x", "E", n_pages=1,
        schema="s string, d double",
    ).collect()
    by3 = {r["s"]: r for r in rows3}
    import math as _math
    assert by3["n"]["d"] is None
    assert by3["i"]["d"] is not None and _math.isinf(by3["i"]["d"])


def test_station_csv_quote_and_blank_semantics(spark, tmp_path):
    """The line-accounting exceptions the battery deliberately
    excludes, pinned: with multiLine=false (the reader's default) an
    UNBALANCED double quote stays confined to its own line — the row is
    quarantined with its raw text in _corrupt, the NEXT line parses
    normally (no cross-line merge) — blank lines are skipped entirely,
    and a lone-NUL line behaves like a blank (univocity's default null
    character)."""
    from mysense_spark.sources.stations import read_station_csv

    path = tmp_path / "q.csv"
    path.write_text(
        "station_id,ts,pm25,pm10,no2,o3\n"
        'S1,2024-01-01T00:00:00,"broken\n'
        "S2,2024-01-01T01:00:00,1.0,2.0,,\n"
        "\n"
        "S3,2024-01-01T02:00:00,3.0,4.0,,\n"
    )
    rows = read_station_csv(spark, str(path)).collect()
    assert len(rows) == 3  # quarantined S1 + parsed S2 + S3; blank skipped
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(bad) == 1 and bad[0]["_corrupt"].startswith("S1,")
    assert "S2" not in bad[0]["_corrupt"]  # no cross-line merge
    assert any(r["station_id"] == "S2" and r["pm25"] == 1.0 for r in rows)
    assert any(r["station_id"] == "S3" and r["pm25"] == 3.0 for r in rows)
    # a line holding only NUL behaves like a blank line (univocity's
    # default null character): skipped, not quarantined
    p2 = tmp_path / "nul.csv"
    p2.write_text("station_id,ts,pm25,pm10,no2,o3\n\x00\nS9,2024-01-01T03:00:00,1.0,2.0,,\n")
    rows2 = read_station_csv(spark, str(p2)).collect()
    assert [r["station_id"] for r in rows2] == ["S9"]

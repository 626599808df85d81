"""Pure-Python Avro object-container sink/scan (sources/avro_py.py).

Interop is the point: pyspark ships the core Apache Avro JAVA runtime
(avro-1.12.1.jar) but not the spark-avro connector, so these tests
prove the wire format against the OFFICIAL implementation through
py4j — Python-written files read by org.apache.avro.file.DataFileReader,
and Java-DataFileWriter-written files read by the Python decoder —
rather than trusting a self-roundtrip alone.
"""

from __future__ import annotations

import os

import pytest

from nemscraper_spark.sources import avro_py


def test_events_projection_roundtrip(spark, sf_dir, tmp_path):
    """write_avro -> read_avro preserves count + exact checksums of the
    format_roundtrip_matrix projection (the avro arm of the format
    breadth gap, staged for the round-8 registry fold-in)."""
    from pyspark.sql import functions as F

    from nemscraper_spark.queries.common import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    out = str(tmp_path / "events_avro")
    n = avro_py.write_avro(ev, out)
    back = avro_py.read_avro(spark, out)
    truth = ev.agg(
        F.count("*").alias("n"),
        (F.sum("event_id") + F.sum("user_id")).cast("long").alias("ck"),
        F.countDistinct("event_type").alias("t"),
    ).first()
    got = back.agg(
        F.count("*").alias("n"),
        (F.sum("event_id") + F.sum("user_id")).cast("long").alias("ck"),
        F.countDistinct("event_type").alias("t"),
    ).first()
    assert n == truth["n"]
    assert (got["n"], got["ck"], got["t"]) == (
        truth["n"],
        truth["ck"],
        truth["t"],
    )
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) >= 1


def test_python_written_file_reads_in_official_java_avro(spark, tmp_path):
    """Cross-implementation proof, write side: a file produced by the
    pure-Python encoder must parse in org.apache.avro's DataFileReader
    (schema, row count, values, null handling)."""
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (3, -0.25, None)],
        "id bigint, x double, s string",
    ).coalesce(1)
    out = str(tmp_path / "jv")
    avro_py.write_avro(df, out)
    path = os.path.join(
        out, [f for f in os.listdir(out) if f.endswith(".avro")][0]
    )

    jvm = spark._jvm
    jfile = jvm.java.io.File(path)
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jfile, reader)
    rows = []
    while dfr.hasNext():
        rec = dfr.next()
        s = rec.get("s")
        rows.append(
            (
                rec.get("id"),
                rec.get("x"),
                None if s is None else s.toString(),
            )
        )
    dfr.close()
    assert sorted(rows, key=lambda r: r[0]) == [
        (1, 2.5, "a"),
        (2, None, "b"),
        (3, -0.25, None),
    ]


def test_java_written_file_reads_in_python_decoder(spark, tmp_path):
    """Cross-implementation proof, read side: a file produced by the
    official Java DataFileWriter must decode through read_avro."""
    jvm = spark._jvm
    schema_str = (
        '{"type":"record","name":"r","fields":['
        '{"name":"id","type":["null","long"]},'
        '{"name":"s","type":["null","string"]}]}'
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_str)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    path = str(tmp_path / "java_written.avro")
    dfw.create(schema, jvm.java.io.File(path))
    # py4j sends python ints < 2^31 as java Integer, which the
    # ["null","long"] union rejects (and Long.valueOf results are
    # auto-unboxed back to python ints) — use values that only fit in
    # a Long so py4j must transmit them as one
    base = 1 << 40
    for i, s in ((base + 1, "x"), (base + 2, None), (base + 3, "z")):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", i)
        rec.put("s", s)
        dfw.append(rec)
    dfw.close()

    got = sorted(
        (r.id, r.s) for r in avro_py.read_avro(spark, path).collect()
    )
    assert got == [(base + 1, "x"), (base + 2, None), (base + 3, "z")]

    # the module-level decoder agrees with the distributed one
    with open(path, "rb") as fh:
        fields, cols = avro_py.decode_container(fh.read())
    assert [n for n, _ in fields] == ["id", "s"]
    assert sorted(zip(cols[0], cols[1])) == [
        (base + 1, "x"),
        (base + 2, None),
        (base + 3, "z"),
    ]


def test_type_breadth_and_nulls_roundtrip(spark, tmp_path):
    """All in-scope kinds (long/int/double/float/boolean/string/bytes/
    timestamp) with nulls in every column survive the roundtrip."""
    import datetime

    rows = [
        (
            1,
            7,
            1.5,
            2.0,
            True,
            "αβ",
            bytearray(b"\x00\x01"),
            datetime.datetime(2025, 6, 1, 12, 30, 0, 123456),
        ),
        (None, None, None, None, None, None, None, None),
        (
            -(2**62),
            -42,
            -1e300,
            -0.5,
            False,
            "",
            bytearray(b""),
            datetime.datetime(1969, 12, 31, 23, 59, 59),
        ),
    ]
    ddl = (
        "a bigint, b int, c double, d float, e boolean, f string, "
        "g binary, h timestamp_ntz"
    )
    df = spark.createDataFrame(rows, ddl).coalesce(1)
    out = str(tmp_path / "breadth")
    avro_py.write_avro(df, out)
    back = avro_py.read_avro(spark, out)
    assert back.schema.simpleString() == df.schema.simpleString()
    a = sorted(df.collect(), key=lambda r: (r.a is None, r.a or 0))
    b = sorted(back.collect(), key=lambda r: (r.a is None, r.a or 0))
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_out_of_scope_type_is_refused(spark):
    df = spark.createDataFrame([([1, 2],)], "arr array<int>")
    with pytest.raises(ValueError, match="avro_py scope"):
        avro_py.fields_for(df.schema)


def test_inline_and_module_encoders_agree(spark, tmp_path):
    """The self-contained task-closure encoder and the module-level
    write_container must produce byte-identical files (same payload,
    same content-derived sync marker) — the twins cannot drift."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id bigint, s string"
    ).coalesce(1)
    out = str(tmp_path / "twins")
    avro_py.write_avro(df, out)
    path = os.path.join(
        out, [f for f in os.listdir(out) if f.endswith(".avro")][0]
    )
    with open(path, "rb") as fh:
        distributed = fh.read()
    fields = avro_py.fields_for(df.schema)
    cols = [[1, 2], ["a", None]]
    module_level = avro_py.write_container(fields, cols, 2)
    assert distributed == module_level


def test_codec_fuzz_roundtrip():
    """Property: encode_rows/decode_container roundtrip arbitrary
    in-scope values bit-exactly, across the full 64-bit int domain,
    unicode strings, arbitrary bytes, and nulls anywhere."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cols = st.one_of(
        st.tuples(
            st.just("long"),
            st.lists(
                st.one_of(
                    st.none(),
                    st.integers(-(2**63), 2**63 - 1),
                ),
                min_size=1,
                max_size=8,
            ),
        ),
        st.tuples(
            st.just("double"),
            st.lists(
                st.one_of(
                    st.none(),
                    st.floats(allow_nan=False),
                ),
                min_size=1,
                max_size=8,
            ),
        ),
        st.tuples(
            st.just("string"),
            st.lists(st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=8),
        ),
        st.tuples(
            st.just("bytes"),
            st.lists(
                st.one_of(st.none(), st.binary(max_size=20)),
                min_size=1,
                max_size=8,
            ),
        ),
        st.tuples(
            st.just("boolean"),
            st.lists(st.one_of(st.none(), st.booleans()), min_size=1, max_size=8),
        ),
        st.tuples(
            st.just("int"),
            st.lists(
                st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
                min_size=1,
                max_size=8,
            ),
        ),
        st.tuples(
            st.just("float"),
            st.lists(
                st.one_of(st.none(), st.floats(allow_nan=False, width=32)),
                min_size=1,
                max_size=8,
            ),
        ),
        # the three zigzag-long logical types: the VALUES are plain
        # ints at this layer (the Spark surface does the datetime
        # mapping), but fuzzing them exercises schema_json /
        # parse_header round-tripping the logicalType dicts.
        st.tuples(
            st.sampled_from(
                ["timestamp-micros", "local-timestamp-micros"]
            ),
            st.lists(
                st.one_of(st.none(), st.integers(-(2**62), 2**62 - 1)),
                min_size=1,
                max_size=8,
            ),
        ),
        st.tuples(
            st.just("date"),
            st.lists(
                st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
                min_size=1,
                max_size=8,
            ),
        ),
    )

    @given(st.lists(cols, min_size=1, max_size=4))
    @settings(max_examples=200, deadline=None)
    def check(column_specs):
        n = min(len(vals) for _, vals in column_specs)
        fields = [(f"c{i}", k) for i, (k, _) in enumerate(column_specs)]
        columns = [vals[:n] for _, vals in column_specs]
        data = avro_py.write_container(fields, columns, n)
        f2, cols2 = avro_py.decode_container(data)
        assert f2 == fields
        assert cols2 == columns

    check()


def test_zigzag_boundaries():
    for n in (0, -1, 1, 2**63 - 1, -(2**63), 63, -64, 2**31, -(2**31) - 1):
        enc = avro_py.zigzag_encode(n)
        dec, pos = avro_py.zigzag_decode(memoryview(enc), 0)
        assert dec == n and pos == len(enc), n


def test_deflate_codec_roundtrip_and_java_reads_it(spark, tmp_path):
    """The spec's required compression codec: deflate blocks roundtrip
    through the Python decoder AND parse in the official Java reader
    (DeflateCodec ships in avro core), and the file is actually
    smaller than its stored-codec twin on repetitive data."""
    rows = [(i, "the quick brown fox " * 5) for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, s string").coalesce(1)
    out_null = str(tmp_path / "c_null")
    out_defl = str(tmp_path / "c_defl")
    avro_py.write_avro(df, out_null, codec="null")
    avro_py.write_avro(df, out_defl, codec="deflate")

    def one(d):
        return os.path.join(
            d, [f for f in os.listdir(d) if f.endswith(".avro")][0]
        )

    assert os.path.getsize(one(out_defl)) < os.path.getsize(one(out_null)) / 5

    back = avro_py.read_avro(spark, out_defl)
    assert back.count() == 2000
    assert sorted(r.id for r in back.collect()) == list(range(2000))

    jvm = spark._jvm
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(one(out_defl)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    n = 0
    first = None
    while dfr.hasNext():
        rec = dfr.next()
        if first is None:
            first = (rec.get("id"), rec.get("s").toString())
        n += 1
    dfr.close()
    assert n == 2000
    assert first == (0, "the quick brown fox " * 5)


def test_corrupt_inputs_fail_loudly(spark, tmp_path):
    """Truncated payloads, flipped sync markers and bad magic must
    raise, never return partial rows — a silent short read in a dedup
    input corrupts everything downstream."""
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(50)], "id bigint, s string"
    ).coalesce(1)
    out = str(tmp_path / "good")
    avro_py.write_avro(df, out)
    path = os.path.join(
        out, [f for f in os.listdir(out) if f.endswith(".avro")][0]
    )
    good = open(path, "rb").read()

    with pytest.raises(ValueError, match="magic"):
        avro_py.decode_container(b"NOPE" + good[4:])

    flipped = bytearray(good)
    flipped[-1] ^= 0xFF  # last sync byte
    with pytest.raises(ValueError, match="sync"):
        avro_py.decode_container(bytes(flipped))

    with pytest.raises((ValueError, IndexError)):
        avro_py.decode_container(good[: len(good) - 20])


def test_schema_drift_across_files_is_refused(spark, tmp_path):
    """read_avro derives the scan schema from the first file; a file
    with different field names in the same directory must fail the
    scan, not silently misalign columns."""
    d = str(tmp_path / "mixed")
    avro_py.write_avro(
        spark.createDataFrame([(1, "a")], "id bigint, s string").coalesce(1),
        d,
    )
    avro_py.write_avro(
        spark.createDataFrame([(1, "a")], "other bigint, s string").coalesce(1),
        d,
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        avro_py.read_avro(spark, d).collect()
    assert "drift" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def test_empty_write_yields_no_files_and_read_refuses(spark, tmp_path):
    """A zero-row frame writes no container files (empty tasks yield
    nothing, matching the brotli sink contract) and read_avro on the
    empty directory raises FileNotFoundError instead of returning an
    empty frame of guessed schema."""
    d = str(tmp_path / "empty")
    n = avro_py.write_avro(
        spark.createDataFrame([], "id bigint, s string"), d
    )
    assert n == 0
    assert [f for f in os.listdir(d) if f.endswith(".avro")] == []
    with pytest.raises(FileNotFoundError):
        avro_py.read_avro(spark, d)


def test_schema_kind_drift_across_files_is_refused(spark, tmp_path):
    """Same field NAMES but different KINDS across files must refuse,
    not silently coerce into the first file's Arrow schema (a long
    column read through a float64 field loses precision above 2^53) —
    round-7 ADVICE medium."""
    d = str(tmp_path / "kindmix")
    avro_py.write_avro(
        spark.createDataFrame([(1, "a")], "id bigint, s string").coalesce(1),
        d,
    )
    avro_py.write_avro(
        spark.createDataFrame([(1.5, "a")], "id double, s string").coalesce(1),
        d,
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        avro_py.read_avro(spark, d).collect()
    assert "drift" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def test_timestamp_instant_roundtrip_nonutc_session(spark, tmp_path):
    """Spark `timestamp` (an instant) must come back as `timestamp` —
    not timestamp_ntz — carrying the same epoch micros even when the
    session timezone is not UTC (round-7 ADVICE: the old mapping
    changed the type and, for non-UTC sessions, the displayed wall
    time).  timestamp_ntz must round-trip as local-timestamp-micros
    and keep its wall-clock reading."""
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    try:
        df = spark.sql(
            """
            SELECT CAST(v AS BIGINT) AS id,
                   timestamp_micros(v) AS ts_instant,
                   CAST(timestamp_micros(v) AS timestamp_ntz) AS ts_wall
            FROM VALUES (1717245000123456), (0), (-2208988800000000) t(v)
            """
        ).coalesce(1)
        out = str(tmp_path / "tsround")
        avro_py.write_avro(df, out)
        back = avro_py.read_avro(spark, out)
        assert back.schema.simpleString() == df.schema.simpleString()
        want = {
            (r.id, r.ts_instant, r.ts_wall) for r in df.collect()
        }
        got = {(r.id, r.ts_instant, r.ts_wall) for r in back.collect()}
        assert got == want
        # the wire micros are true epoch micros for the instant column
        epochs = {
            r.e
            for r in back.selectExpr(
                "unix_micros(ts_instant) AS e"
            ).collect()
        }
        assert epochs == {1717245000123456, 0, -2208988800000000}
        # and the written logical types are the spec's pair
        import glob as _glob
        import json as _json

        f = sorted(_glob.glob(out + "/*.avro"))[0]
        with open(f, "rb") as fh:
            head = fh.read(1 << 20)
        pos = 4
        meta = {}
        buf = memoryview(head)
        while True:
            n, pos = avro_py.zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = avro_py.zigzag_decode(buf, pos)
            for _ in range(n):
                kl, pos = avro_py.zigzag_decode(buf, pos)
                key = bytes(buf[pos : pos + kl]).decode()
                pos += kl
                vl, pos = avro_py.zigzag_decode(buf, pos)
                meta[key] = bytes(buf[pos : pos + vl])
                pos += vl
        schema = _json.loads(meta["avro.schema"].decode())
        lts = {
            fld["name"]: [
                b.get("logicalType")
                for b in fld["type"]
                if isinstance(b, dict)
            ]
            for fld in schema["fields"]
        }
        assert lts["ts_instant"] == ["timestamp-micros"]
        assert lts["ts_wall"] == ["local-timestamp-micros"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)

"""Pure-numpy .osm.pbf source: codec round-trips + export equivalence.

The reference tool's only input format (reference sources.py:24-32,
cmd.py:58). Coverage:

* varint / zigzag primitives on adversarial values (0, 1, boundaries,
  int64 extremes, random);
* write→read golden round-trip of every element kind, tags, roles,
  multi-blob chunking, uncompressed blobs, non-default granularity /
  offsets (hand-built block — the writer always emits the default);
* bit-exact coordinate round-trip on the 1e-7 grid (OSM native
  precision);
* malformed inputs raise, never silently truncate;
* THE capstone: a full export over the pbf encoding of the synthetic
  corpus's elements equals the export over the parquet corpus,
  feature-for-feature (wkb bytes, bboxes, tags) — proving a user can
  point the CLI at a .pbf and get the identical product.
"""

import bz2
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from osm_export_tool_python_ray.sources.pbf import (
    _blob_payload,
    _enc_bytes,
    _enc_packed,
    _enc_varint,
    _enc_vint_field,
    _wrap_blob,
    _zigzag,
    decode_file,
    decode_primitive_block,
    decode_varints,
    iter_fields,
    scan_blob_ranges,
    unzigzag,
    write_osm_pbf,
)


class TestVarints:
    def test_roundtrip_adversarial(self):
        vals = [0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**63 - 1, 2**64 - 1]
        buf = b"".join(_enc_varint(v) for v in vals)
        got = decode_varints(buf)
        assert [int(v) for v in got] == vals

    def test_roundtrip_random(self):
        rng = np.random.default_rng(3)
        vals = [int(v) for v in rng.integers(0, 2**62, 5000)]
        buf = b"".join(_enc_varint(v) for v in vals)
        assert [int(v) for v in decode_varints(buf)] == vals

    def test_zigzag_extremes(self):
        vals = [0, -1, 1, -2, 2, 2**62, -(2**62), 2**63 - 1, -(2**63)]
        enc = np.array([_zigzag(v) for v in vals], dtype=np.uint64)
        assert [int(v) for v in unzigzag(enc)] == vals

    def test_truncated_varint_raises(self):
        with pytest.raises(ValueError, match="truncated"):
            decode_varints(b"\xff\xff")  # continuation bits never end

    def test_empty(self):
        assert len(decode_varints(b"")) == 0


def _els():
    return [
        {"type": "node", "id": 1, "lon": 0.01, "lat": 0.02,
         "tags": {"amenity": "bank", "name": "First Bank"}},
        {"type": "node", "id": 2, "lon": 0.0123456, "lat": -0.54321, "tags": {}},
        {"type": "node", "id": 7, "lon": 179.9999999, "lat": -85.0511287,
         "tags": {"addr:housenumber": "12"}},
        {"type": "node", "id": 5, "lon": -179.9999999, "lat": 85.0511287,
         "tags": {}},  # descending id after 7 → negative delta
        {"type": "way", "id": 10, "refs": [1, 2, 7, 5, 1],
         "tags": {"highway": "primary", "name": "Rd"}},
        {"type": "way", "id": 11, "refs": [7, 2], "tags": {}},
        {"type": "relation", "id": 20,
         "tags": {"type": "multipolygon", "landuse": "forest"},
         "members": [{"type": "way", "ref": 10, "role": "outer"},
                     {"type": "way", "ref": 11, "role": "inner"},
                     {"type": "node", "ref": 1, "role": ""}]},
    ]


class TestRoundTrip:
    def _check(self, t):
        els = _els()
        assert t.num_rows == len(els)
        assert t.column("element_id").to_pylist() == [e["id"] for e in els]
        assert t.column("kind").to_pylist() == [e["type"] for e in els]
        got_tags = [dict(x) for x in t.column("tags").to_pylist()]
        assert got_tags == [dict(e.get("tags") or {}) for e in els]
        # bit-exact coordinates (inputs on the 1e-7 grid)
        for i, e in enumerate(els):
            if e["type"] == "node":
                assert t.column("lon").to_pylist()[i] == e["lon"]
                assert t.column("lat").to_pylist()[i] == e["lat"]
        assert t.column("refs").to_pylist()[4] == [1, 2, 7, 5, 1]
        assert t.column("members").to_pylist()[6] == _els()[6]["members"]
        # explode-parity conventions
        assert t.column("refs").to_pylist()[0] is None
        assert np.isnan(t.column("lon").to_pylist()[4])
        assert t.column("offset").to_pylist() == list(range(len(els)))
        assert "ekey" in t.column_names

    def test_compressed(self, tmp_path):
        p = str(tmp_path / "a.pbf")
        write_osm_pbf(p, _els())
        self._check(decode_file(p))

    def test_uncompressed_raw_blob(self, tmp_path):
        p = str(tmp_path / "b.pbf")
        write_osm_pbf(p, _els(), compress=False)
        self._check(decode_file(p))

    def test_multi_blob_chunking(self, tmp_path):
        p = str(tmp_path / "c.pbf")
        write_osm_pbf(p, _els(), max_group=2)  # forces 4 OSMData blobs
        kinds = [b[0] for b in scan_blob_ranges(p)]
        assert kinds[0] == "OSMHeader" and kinds.count("OSMData") == 4
        t = decode_file(p)
        assert t.column("element_id").to_pylist() == [e["id"] for e in _els()]
        # doc_id tracks the source blob; offset restarts per blob
        assert len(set(t.column("doc_id").to_pylist())) == 4
        assert t.column("offset").to_pylist() == [0, 1, 0, 1, 0, 1, 0]

    def test_table_input(self, tmp_path):
        p1 = str(tmp_path / "d1.pbf")
        p2 = str(tmp_path / "d2.pbf")
        write_osm_pbf(p1, _els())
        write_osm_pbf(p2, decode_file(p1))  # table → identical bytes
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_many_nodes_bitexact_grid(self, tmp_path):
        rng = np.random.default_rng(9)
        k = rng.integers(-1_800_000_000, 1_800_000_000, 20000)
        lon = k / 1e7  # nearest-double of the 1e-7 grid
        lat = rng.integers(-850_000_000, 850_000_000, 20000) / 1e7
        els = [
            {"type": "node", "id": i + 1, "lon": lon[i], "lat": lat[i], "tags": {}}
            for i in range(20000)
        ]
        p = str(tmp_path / "grid.pbf")
        write_osm_pbf(p, els)
        t = decode_file(p)
        assert np.array_equal(
            t.column("lon").to_numpy(zero_copy_only=False), lon
        )
        assert np.array_equal(
            t.column("lat").to_numpy(zero_copy_only=False), lat
        )


class TestNonDefaultEncodings:
    def test_granularity_and_offsets(self):
        """Hand-built PrimitiveBlock with granularity=1000 and nonzero
        offsets — the writer never emits these, the reader must honor
        them (real planet files sometimes do)."""
        st = _enc_bytes(1, _enc_bytes(1, b""))
        dense = _enc_packed(1, [42], zigzag=True, delta=True)
        dense += _enc_packed(8, [123456], zigzag=True, delta=True)  # lat units
        dense += _enc_packed(9, [-654321], zigzag=True, delta=True)
        group = _enc_bytes(2, dense)
        block = (
            st
            + _enc_bytes(2, group)
            + _enc_vint_field(17, 1000)  # granularity
            + _enc_vint_field(19, 5_000_000)  # lat_offset nano
            + _enc_vint_field(20, 7_000_000)
        )
        t = decode_primitive_block(block, "pbf:000000")
        assert t.column("element_id").to_pylist() == [42]
        assert t.column("lat").to_pylist()[0] == (5_000_000 + 1000 * 123456) / 1e9
        assert t.column("lon").to_pylist()[0] == (7_000_000 + 1000 * -654321) / 1e9

    def test_plain_nongroup_nodes(self):
        """Non-dense Node messages (field 1 of PrimitiveGroup, sint64
        id/lat/lon) — rare but legal."""
        st = _enc_bytes(1, _enc_bytes(1, b"") + _enc_bytes(1, b"k") + _enc_bytes(1, b"v"))
        node = (
            _enc_varint(1 << 3) + _enc_varint(_zigzag(-99))
            + _enc_packed(2, [1]) + _enc_packed(3, [2])
            + _enc_varint(8 << 3) + _enc_varint(_zigzag(20_000_000))
            + _enc_varint(9 << 3) + _enc_varint(_zigzag(-10_000_000))
        )
        group = _enc_bytes(1, node)
        block = st + _enc_bytes(2, group)
        t = decode_primitive_block(block, "pbf:000000")
        assert t.column("element_id").to_pylist() == [-99]
        assert dict(t.column("tags").to_pylist()[0]) == {"k": "v"}
        assert t.column("lat").to_pylist()[0] == 2.0
        assert t.column("lon").to_pylist()[0] == -1.0


class TestMalformed:
    def test_truncated_file(self, tmp_path):
        p = str(tmp_path / "t.pbf")
        write_osm_pbf(p, _els())
        data = open(p, "rb").read()
        bad = str(tmp_path / "bad.pbf")
        open(bad, "wb").write(data[: len(data) - 7])
        with pytest.raises((ValueError, zlib.error, IndexError)):
            decode_file(bad)

    def test_garbage_header(self, tmp_path):
        bad = str(tmp_path / "g.pbf")
        open(bad, "wb").write(struct.pack(">I", 10) + b"\x00" * 10)
        with pytest.raises(ValueError):
            scan_blob_ranges(bad)


class TestRayDataset:
    def test_read_osm_pbf_parallel_blobs(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.sources.pbf import read_osm_pbf

        els = []
        for i in range(50):
            els.append({"type": "node", "id": i + 1, "lon": (i % 10) * 0.01,
                        "lat": (i // 10) * 0.01, "tags": {"n": str(i)}})
        p = str(tmp_path / "r.pbf")
        write_osm_pbf(p, els, max_group=8)  # 7 blobs
        ds = read_osm_pbf(p, blobs_per_task=2)
        t = pa.concat_tables(
            list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        assert sorted(t.column("element_id").to_pylist()) == list(range(1, 51))
        # doc_id carries the GLOBAL blob index (header blob = 0), a
        # stable file coordinate shared with decode_file
        assert sorted(set(t.column("doc_id").to_pylist())) == [
            "pbf:%06d" % i for i in range(1, 8)
        ]


class TestExportEquivalence:
    def test_pbf_export_equals_parquet_export(self, ray_session, tmp_path):
        """Capstone: export over .pbf == export over the parquet corpus,
        feature-for-feature (wkb/tags/bbox bit-exact; provenance columns
        excluded — they name the source container)."""
        import ray.data

        from osm_export_tool_python_ray.mapping import Mapping
        from osm_export_tool_python_ray.pipelines.export import (
            parse_elements,
            run_export,
        )
        from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet
        from osm_export_tool_python_ray.sources.pbf import read_osm_pbf

        corpus = str(tmp_path / "corpus.parquet")
        write_corpus_parquet(corpus, n_shards=2)
        with open(
            "/root/reference/osm_export_tool/mappings/default.yml"
        ) as f:
            mapping = Mapping(f.read())

        docs = ray.data.read_parquet(corpus)
        elements = parse_elements(docs).materialize()
        etab = pa.concat_tables(
            list(elements.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        # stable input order for the writer
        etab = etab.sort_by([("ekey", "ascending")])
        pbf_path = str(tmp_path / "corpus.pbf")
        write_osm_pbf(pbf_path, etab, max_group=500)

        a = run_export(docs, mapping).to_pandas()
        b = run_export(
            None, mapping, elements_ds=read_osm_pbf(pbf_path)
        ).to_pandas()

        drop = ["doc_id", "offset", "source_kind"]
        a = a.drop(columns=drop).sort_values(
            ["theme", "osm_id", "geom_type"], kind="mergesort"
        ).reset_index(drop=True)
        b = b.drop(columns=drop).sort_values(
            ["theme", "osm_id", "geom_type"], kind="mergesort"
        ).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        assert list(a.columns) == list(b.columns)
        for col in a.columns:
            if col == "tags":
                assert [list(x) for x in a[col]] == [list(x) for x in b[col]]
            elif a[col].dtype == np.float64:
                # bit-exact up to NaN placement (ways/relations carry NaN
                # lon/lat by convention)
                assert np.array_equal(
                    a[col].to_numpy(), b[col].to_numpy(), equal_nan=True
                ), col
            else:
                av, bv = list(a[col]), list(b[col])
                assert av == bv, col


class TestCodecsAndHeader:
    def test_lzma_and_bzip2_blobs(self, tmp_path):
        """Spec-legal alternative Blob codecs (stdlib): rewrap the
        writer's zlib blobs as lzma / bzip2 and decode."""
        import lzma as _lzma

        from osm_export_tool_python_ray.sources.pbf import (
            _enc_bytes as eb,
            _enc_vint_field as ev,
        )

        src = str(tmp_path / "z.pbf")
        write_osm_pbf(src, _els())
        out = bytearray()
        with open(src, "rb") as f:
            for btype, off, size in scan_blob_ranges(src):
                f.seek(off)
                payload = _blob_payload(f.read(size))
                z = _lzma.compress(payload)
                blob = ev(2, len(payload)) + eb(4, z)
                hdr = eb(1, btype.encode()) + ev(3, len(blob))
                out += struct.pack(">I", len(hdr)) + hdr + blob
        dst = str(tmp_path / "l.pbf")
        open(dst, "wb").write(bytes(out))
        t = decode_file(dst)
        assert t.column("element_id").to_pylist() == [e["id"] for e in _els()]

        out = bytearray()
        with open(src, "rb") as f:
            for btype, off, size in scan_blob_ranges(src):
                f.seek(off)
                payload = _blob_payload(f.read(size))
                z = bz2.compress(payload)
                blob = ev(2, len(payload)) + eb(5, z)
                hdr = eb(1, btype.encode()) + ev(3, len(blob))
                out += struct.pack(">I", len(hdr)) + hdr + blob
        dst2 = str(tmp_path / "b.pbf")
        open(dst2, "wb").write(bytes(out))
        t = decode_file(dst2)
        assert t.column("element_id").to_pylist() == [e["id"] for e in _els()]

    def test_unsupported_codec_names_itself(self, tmp_path):
        from osm_export_tool_python_ray.sources.pbf import (
            _enc_bytes as eb,
            _enc_vint_field as ev,
        )

        blob = ev(2, 4) + eb(7, b"\x00\x01")  # pretend-zstd
        hdr = eb(1, b"OSMData") + ev(3, len(blob))
        p = str(tmp_path / "z.pbf")
        with open(p, "wb") as f:
            # minimal valid header blob first
            hpay = eb(4, b"OsmSchema-V0.6")
            hblob = eb(1, hpay)
            hh = eb(1, b"OSMHeader") + ev(3, len(hblob))
            f.write(struct.pack(">I", len(hh)) + hh + hblob)
            f.write(struct.pack(">I", len(hdr)) + hdr + blob)
        with pytest.raises(ValueError, match="zstd"):
            decode_file(p)

    def test_required_feature_rejection(self, tmp_path):
        """The spec's rejection rule: a file REQUIRING a feature this
        reader does not implement must raise, not silently miscount."""
        from osm_export_tool_python_ray.sources.pbf import (
            _enc_bytes as eb,
            _enc_vint_field as ev,
            check_header,
        )

        hpay = eb(4, b"OsmSchema-V0.6") + eb(4, b"HistoricalInformation")
        hblob = eb(1, hpay)
        hh = eb(1, b"OSMHeader") + ev(3, len(hblob))
        p = str(tmp_path / "h.pbf")
        open(p, "wb").write(struct.pack(">I", len(hh)) + hh + hblob)
        with pytest.raises(ValueError, match="HistoricalInformation"):
            check_header(p)
        with pytest.raises(ValueError, match="HistoricalInformation"):
            decode_file(p)

    def test_writer_features_accepted(self, tmp_path):
        from osm_export_tool_python_ray.sources.pbf import check_header

        p = str(tmp_path / "ok.pbf")
        write_osm_pbf(p, _els())
        assert sorted(check_header(p)) == ["DenseNodes", "OsmSchema-V0.6"]


class TestMultiFileAndSink:
    def test_read_glob_and_list(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.sources.pbf import read_osm_pbf

        els = _els()
        p1 = str(tmp_path / "part-0.osm.pbf")
        p2 = str(tmp_path / "part-1.osm.pbf")
        write_osm_pbf(p1, [e for e in els if e["type"] == "node"])
        write_osm_pbf(p2, [e for e in els if e["type"] != "node"])
        for src in (str(tmp_path / "part-*.osm.pbf"), [p1, p2]):
            ds = read_osm_pbf(src)
            got = sorted(
                pa.concat_tables(
                    list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
                )
                .column("element_id")
                .to_pylist()
            )
            assert got == sorted(e["id"] for e in els)
        with pytest.raises(FileNotFoundError):
            read_osm_pbf(str(tmp_path / "nope-*.pbf"))

    def test_partitioned_sink_roundtrip(self, ray_session, tmp_path):
        import ray.data

        from osm_export_tool_python_ray.sources.pbf import (
            decode_file,
            read_osm_pbf,
            write_osm_pbf_parts,
        )

        src = str(tmp_path / "src.osm.pbf")
        els = [
            {"type": "node", "id": i + 1, "lon": (i % 9) * 0.01,
             "lat": (i // 9) * 0.01, "tags": {"n": str(i)}}
            for i in range(200)
        ]
        write_osm_pbf(src, els)
        elements = read_osm_pbf(src)
        out_dir = str(tmp_path / "parts")
        res = write_osm_pbf_parts(elements, out_dir, max_group=64).to_pandas()
        assert res["n_elements"].sum() == 200
        back = []
        for pth in sorted(res["path"]):
            back.extend(decode_file(pth).column("element_id").to_pylist())
        assert sorted(back) == list(range(1, 201))


class TestPbfHypothesis:
    """Property fuzz: ANY element table on the 1e-7 coordinate grid
    round-trips write→read exactly (ids, tags, refs, members, coords)."""

    def test_random_tables_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        tag_str = st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=0,
            max_size=12,
        )
        node = st.fixed_dictionaries(
            {
                "type": st.just("node"),
                "id": st.integers(min_value=-(2**62), max_value=2**62),
                "lon": st.integers(-1800000000, 1800000000).map(lambda k: k / 1e7),
                "lat": st.integers(-850000000, 850000000).map(lambda k: k / 1e7),
                "tags": st.dictionaries(tag_str, tag_str, max_size=3),
            }
        )
        way = st.fixed_dictionaries(
            {
                "type": st.just("way"),
                "id": st.integers(min_value=0, max_value=2**62),
                "refs": st.lists(
                    st.integers(-(2**62), 2**62), min_size=0, max_size=8
                ),
                "tags": st.dictionaries(tag_str, tag_str, max_size=3),
            }
        )
        rel = st.fixed_dictionaries(
            {
                "type": st.just("relation"),
                "id": st.integers(min_value=0, max_value=2**62),
                "members": st.lists(
                    st.fixed_dictionaries(
                        {
                            "type": st.sampled_from(["node", "way", "relation"]),
                            "ref": st.integers(-(2**62), 2**62),
                            "role": tag_str,
                        }
                    ),
                    max_size=4,
                ),
                "tags": st.dictionaries(tag_str, tag_str, max_size=3),
            }
        )

        @settings(max_examples=60, deadline=None)
        @given(
            els=st.lists(
                st.one_of(node, way, rel),
                min_size=1,
                max_size=20,
                unique_by=lambda e: (e["type"], int(e["id"])),
            )
        )
        def check(els):
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".pbf") as f:
                write_osm_pbf(f.name, els, max_group=7)
                t = decode_file(f.name)
            assert t.num_rows == len(els)
            # the FORMAT groups dense nodes before ways/relations within
            # a block, so interleaved inputs reorder within a chunk —
            # compare keyed by (kind, id), which the fuzz keeps unique
            got = {}
            for i in range(t.num_rows):
                got[(t.column("kind")[i].as_py(), t.column("element_id")[i].as_py())] = i
            for e in els:
                i = got[(e["type"], int(e["id"]))]
                assert dict(t.column("tags")[i].as_py()) == dict(e["tags"])
                if e["type"] == "node":
                    assert t.column("lon")[i].as_py() == e["lon"]
                    assert t.column("lat")[i].as_py() == e["lat"]
                elif e["type"] == "way":
                    assert t.column("refs")[i].as_py() == [
                        int(r) for r in e["refs"]
                    ]
                else:
                    assert t.column("members")[i].as_py() == [
                        {"type": m["type"], "ref": int(m["ref"]), "role": m["role"]}
                        for m in e["members"]
                    ]

        check()

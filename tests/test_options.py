import pytest

from fabber_core_tpu.exceptions import InvalidOptionValue, MandatoryOptionMissing
from fabber_core_tpu.options import RunOptions


class TestRunOptions:
    def test_typed_getters(self):
        o = RunOptions({"a": "3", "b": "2.5", "c": "hello", "flag": ""})
        assert o.get_int("a") == 3
        assert o.get_float("b") == 2.5
        assert o.get_string("c") == "hello"
        assert o.get_bool("flag") is True
        assert o.get_bool("absent") is False

    def test_bool_with_value_rejected(self):
        o = RunOptions({"flag": "yes"})
        with pytest.raises(InvalidOptionValue):
            o.get_bool("flag")

    def test_bool_python_values(self):
        o = RunOptions({"flag": True, "off": False})
        assert o.get_bool("flag") is True
        assert "off" not in o

    def test_mandatory_missing(self):
        with pytest.raises(MandatoryOptionMissing):
            RunOptions().get_string("required-thing")

    def test_range_validation(self):
        o = RunOptions({"n": "5"})
        with pytest.raises(InvalidOptionValue):
            o.get_int("n", minval=6)
        with pytest.raises(InvalidOptionValue):
            o.get_int("n", maxval=4)
        assert o.get_int("n", minval=1, maxval=10) == 5

    def test_indexed_list(self):
        o = RunOptions({"mt1": "3", "mt2": "7", "mt3": "11"})
        assert o.get_int_list("mt") == [3, 7, 11]
        assert RunOptions().get_int_list("mt") == []

    def test_unused_tracking(self):
        o = RunOptions({"used": "1", "notused": "2"})
        o.get_int("used")
        assert o.unused() == ["notused"]

    def test_cli_parsing(self):
        o = RunOptions().parse_cli(["--method=vb", "--model=poly", "--overwrite"])
        assert o.get_string("method") == "vb"
        assert o.get_bool("overwrite") is True

    def test_duplicate_option_rejected(self):
        with pytest.raises(InvalidOptionValue):
            RunOptions().parse_cli(["--a=1", "--a=2"])

    def test_option_file(self, tmp_path):
        p = tmp_path / "opts.fab"
        p.write_text("# comment\nmethod=vb\n\nmodel=poly\nsave-mean\n")
        o = RunOptions().parse_option_file(str(p))
        assert o.get_string("method") == "vb"
        assert o.get_bool("save-mean") is True


class TestFabRunFile:
    def test_roundtrip_preserves_comments(self, tmp_path):
        from fabber_core_tpu.fabfile import FabRunFile
        src = tmp_path / "run.fab"
        src.write_text("# my run\nmethod=vb\n\nmodel=poly\ndegree=2\n"
                       "save-mean\n")
        fab = FabRunFile(str(src))
        assert fab["method"] == "vb"
        assert fab["save-mean"] == ""
        fab["degree"] = "3"
        fab["noise"] = "white"
        del fab["save-mean"]
        fab.add_comment("edited", option="noise")
        out = tmp_path / "out.fab"
        fab.save(str(out), mask="m.nii.gz")
        text = out.read_text()
        assert text.startswith("# my run\n")
        assert "degree=3" in text
        assert "# edited\nnoise=white" in text
        assert "save-mean" not in text
        # reload round trip
        again = FabRunFile(str(out))
        assert dict(again) == dict(fab)

    def test_cli_accepts_fab_file(self, tmp_path):
        # .fab files are the same format the CLI's -f reads
        from fabber_core_tpu.fabfile import FabRunFile
        from fabber_core_tpu.options import RunOptions
        fab = FabRunFile()
        fab["model"] = "poly"
        fab["degree"] = "2"
        p = tmp_path / "opts.fab"
        fab.save(str(p))
        opts = RunOptions().parse_option_file(str(p))
        assert opts.get_string("model") == "poly"

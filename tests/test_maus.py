"""MAUS BAS web-service client (data/hprc_prep.py §3) against canned HTTP
responses (VERDICT r3 missing #5: the client's XML/status parsing had never
executed, even mocked).  The HTTP layer is stubbed at the ``requests``
module the client imports — no network.

Reference contract: utility.py:142-186 (load-indicator check, runPipeline
multipart POST, downloadLink XML parse) and dataset_hprc.py:439-472 (the
per-utterance TextGrid download walk with skip-existing resume).
"""

from pathlib import Path

import pytest
import requests

from aptai_tpu.data import hprc_prep

_LINK_XML = (
    "<WebServiceResponseLink>"
    "<success>true</success>"
    "<downloadLink>https://bas.example/dl/job42.TextGrid</downloadLink>"
    "<output>done</output>"
    "</WebServiceResponseLink>"
)

_TEXTGRID = (
    'File type = "ooTextFile"\nObject class = "TextGrid"\n'
    "xmin = 0\nxmax = 1\ntiers? <exists>\nsize = 1\nitem []:\n"
)


class _Resp:
    def __init__(self, status_code=200, text="", content=b""):
        self.status_code = status_code
        self.text = text
        self.content = content or text.encode()

    def raise_for_status(self):
        if self.status_code >= 400:
            raise requests.HTTPError(f"status {self.status_code}")


@pytest.fixture
def prep_tree(tmp_path):
    """Two-speaker prep tree with audio + text; one pre-existing TextGrid."""
    for spk, utts in (("F01", ["u1", "u2"]), ("M02", ["u3"])):
        (tmp_path / spk / "audio").mkdir(parents=True)
        (tmp_path / spk / "text").mkdir()
        for utt in utts:
            (tmp_path / spk / "audio" / f"{utt}.wav").write_bytes(b"RIFFfake")
            (tmp_path / spk / "text" / f"{utt}.txt").write_text("a word")
    phn = tmp_path / "F01" / "phonemes"
    phn.mkdir()
    (phn / "u1.TextGrid").write_text("EXISTING")
    return tmp_path


def test_maus_g2p_parses_download_link(tmp_path, monkeypatch):
    posted = {}

    def fake_get(url, **kw):
        assert url.endswith("/getLoadIndicator")
        return _Resp(text="0")

    def fake_post(url, files=None, **kw):
        assert url.endswith("/runPipeline")
        posted.update(files)
        return _Resp(text=_LINK_XML)

    monkeypatch.setattr(requests, "get", fake_get)
    monkeypatch.setattr(requests, "post", fake_post)
    wav = tmp_path / "a.wav"
    txt = tmp_path / "a.txt"
    wav.write_bytes(b"RIFF")
    txt.write_text("hello")

    link = hprc_prep.maus_g2p(wav, txt, language="eng")
    assert link == "https://bas.example/dl/job42.TextGrid"
    # the reference's pipeline parameters travel as multipart form fields
    # (utility.py:163-176)
    assert posted["PIPE"] == (None, "G2P_MAUS")
    assert posted["LANGUAGE"] == (None, "eng")
    assert posted["OUTFORMAT"] == (None, "TextGrid")
    assert posted["OUTSYMBOL"] == (None, "ipa")
    assert "SIGNAL" in posted and "TEXT" in posted


def test_maus_g2p_refuses_on_high_load(tmp_path, monkeypatch):
    monkeypatch.setattr(requests, "get", lambda *a, **k: _Resp(text="2\n"))
    monkeypatch.setattr(
        requests, "post",
        lambda *a, **k: pytest.fail("must not POST when load is high"))
    wav, txt = tmp_path / "a.wav", tmp_path / "a.txt"
    wav.write_bytes(b"RIFF")
    txt.write_text("x")
    with pytest.raises(RuntimeError, match="load"):
        hprc_prep.maus_g2p(wav, txt)


def test_maus_g2p_raises_on_http_error(tmp_path, monkeypatch):
    monkeypatch.setattr(requests, "get", lambda *a, **k: _Resp(text="0"))
    monkeypatch.setattr(requests, "post",
                        lambda *a, **k: _Resp(status_code=500, text="boom"))
    wav, txt = tmp_path / "a.wav", tmp_path / "a.txt"
    wav.write_bytes(b"RIFF")
    txt.write_text("x")
    with pytest.raises(requests.HTTPError):
        hprc_prep.maus_g2p(wav, txt)


def test_run_maus_alignment_walks_and_skips_existing(prep_tree, monkeypatch):
    calls = []

    def fake_get(url, **kw):
        if url.endswith("/getLoadIndicator"):
            return _Resp(text="0")
        calls.append(("download", url))
        return _Resp(text=_TEXTGRID)

    def fake_post(url, files=None, **kw):
        calls.append(("pipeline", url))
        return _Resp(text=_LINK_XML)

    monkeypatch.setattr(requests, "get", fake_get)
    monkeypatch.setattr(requests, "post", fake_post)

    n = hprc_prep.run_maus_alignment(prep_tree)
    # u1 already has a TextGrid -> skipped; u2 and u3 align + download
    assert n == 2
    assert sum(1 for kind, _ in calls if kind == "pipeline") == 2
    assert (prep_tree / "F01" / "phonemes" / "u1.TextGrid").read_text() == (
        "EXISTING")
    assert (prep_tree / "F01" / "phonemes" / "u2.TextGrid").read_text() == (
        _TEXTGRID)
    assert (prep_tree / "M02" / "phonemes" / "u3.TextGrid").read_text() == (
        _TEXTGRID)

    # second run: everything exists, nothing downloaded
    calls.clear()
    assert hprc_prep.run_maus_alignment(prep_tree) == 0
    assert not calls

    # replace=True re-aligns all three
    assert hprc_prep.run_maus_alignment(prep_tree, replace=True) == 3

"""The native-codec swap contract (round-7 VERDICT ask #2): the
registry seam in ``kernels/registry.py`` is a TESTED interface — a
drop-in decoder must pass the same true-arithmetic oracles the driver
correctness gate pins, a wrong one is rejected before it can touch the
pipeline, and ``extract_page_images`` provably dispatches through the
registry (so a verified swap changes extraction without a code edit).
"""

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels import registry
from archive_pdf_tools_spark.kernels.registry import (
    FORMATS, ContractViolation, builtin_decoder, contract_cases,
    get_decoder, register_decoder, reset_decoder, verify_decoder)


@pytest.fixture(autouse=True)
def _restore_registry():
    yield
    reset_decoder()


def test_builtins_pass_their_own_contract():
    """The engine's own decoders satisfy the suite any drop-in must
    satisfy — the contract is anchored to working arithmetic."""
    for fmt in FORMATS:
        verify_decoder(fmt, builtin_decoder(fmt))


def test_contract_cases_are_nontrivial():
    for fmt in FORMATS:
        cases = list(contract_cases(fmt))
        assert len(cases) >= 2
        for args, kwargs, expected in cases:
            assert isinstance(args[0], bytes) and len(args[0]) > 4
            assert expected.size > 0 and expected.max() > 0


def test_faithful_dropin_accepted_and_wrapped():
    """A faithful drop-in (here: the built-in behind a foreign-looking
    wrapper that raises foreign exceptions) registers, serves decodes,
    and its failures surface as the format's TYPED error — the
    metadata-only fallback contract survives the swap."""
    from archive_pdf_tools_spark.kernels.jp2codec import Jp2Error

    calls = []

    def native_jp2(raw: bytes):
        calls.append(len(raw))
        if raw == b"BOOM":
            raise RuntimeError("segfault-adjacent native failure")
        return builtin_decoder("JPEG2000")(raw)

    register_decoder("JPEG2000", native_jp2)
    args, kwargs, expected = next(iter(contract_cases("JPEG2000")))
    assert np.array_equal(get_decoder("JPEG2000")(*args), expected)
    assert calls  # verification + the call above went through it
    with pytest.raises(Jp2Error, match="drop-in"):
        get_decoder("JPEG2000")(b"BOOM")


def test_corrupting_dropin_rejected():
    """A decoder that is wrong by ONE pixel is rejected and the
    registry keeps the built-in."""
    def off_by_one(raw: bytes):
        out = builtin_decoder("JPEG")(raw).copy()
        out.flat[0] ^= 1
        return out

    with pytest.raises(ContractViolation, match="mismatches"):
        register_decoder("JPEG", off_by_one)
    assert get_decoder("JPEG") is builtin_decoder("JPEG")

    def crashes(raw: bytes, globals_data: bytes = b""):
        raise ValueError("cannot decode anything")

    with pytest.raises(ContractViolation, match="raised"):
        register_decoder("JBIG2", crashes)
    assert get_decoder("JBIG2") is builtin_decoder("JBIG2")


def test_extract_page_images_uses_registry(monkeypatch):
    """The PDF scan's decode dispatch IS the registry: swapping a
    marker decoder changes extracted pixels with no pdf_meta edit."""
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf
    from archive_pdf_tools_spark.kernels.jp2codec import encode_jp2
    from archive_pdf_tools_spark.sources.pdf_meta import \
        extract_page_images

    # a real fixture PDF whose first page carries a JPEG2000 image
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (40, 48)).astype(np.uint8)
    pdf = build_pdf([{"width": 48, "height": 40, "images": [
        {"w": 48, "h": 40, "gray": True, "jpx": True,
         "data": encode_jp2(img)}]}])
    base = extract_page_images(pdf, 0)
    assert base and base[0][1].shape == (40, 48)

    marker = np.full((40, 48), 7, dtype=np.uint8)

    def fake_native(raw: bytes):
        return marker

    # bypass verification deliberately: this test wants dispatch proof
    register_decoder("JPEG2000", fake_native, verify=False)
    swapped = extract_page_images(pdf, 0)
    assert np.array_equal(swapped[0][1], marker)
    reset_decoder("JPEG2000")
    again = extract_page_images(pdf, 0)
    assert np.array_equal(again[0][1], base[0][1])


def test_imagestack_front_door_uses_registry():
    """The imagestack page dispatch IS the registry too (round-7-late
    review fix): swapping the PNG/TIFF decoders changes decoded page
    pixels with no imagestack edit — one native swap covers stacks
    and PDFs alike."""
    from archive_pdf_tools_spark.kernels.pngcodec import encode_png
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
    from archive_pdf_tools_spark.operators.imagestack import \
        decode_page_image

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (12, 18)).astype(np.uint8)
    marker = np.full((12, 18), 9, dtype=np.uint8)
    for fmt, blob in (("PNG", encode_png(img)),
                      ("TIFF", encode_tiff(img, compression="lzw"))):
        assert np.array_equal(decode_page_image(blob), img)
        register_decoder(fmt, lambda *a, **kw: marker, verify=False)
        try:
            assert np.array_equal(decode_page_image(blob), marker)
        finally:
            reset_decoder(fmt)
        assert np.array_equal(decode_page_image(blob), img)


def test_maybe_register_native_is_safe_without_libraries():
    """In this container no native codec library exists: the opt-in
    returns empty and leaves the built-ins installed."""
    swapped = registry.maybe_register_native()
    for fmt in FORMATS:
        if fmt not in swapped:
            assert get_decoder(fmt) is builtin_decoder(fmt)


def test_native_codecs_env_opt_in_is_safe():
    """SPARK_GRAFT_NATIVE_CODECS=1 at import time (the job.py
    --native-codecs deploy switch, propagated to executors via
    spark.executorEnv) runs maybe_register_native in every worker;
    with no native libraries in this container the built-ins stay
    installed and import does not crash.  Subprocess so the module
    reload cannot disturb this process's registry identity."""
    import subprocess
    import sys

    code = (
        "import os; os.environ['SPARK_GRAFT_NATIVE_CODECS'] = '1'\n"
        "from archive_pdf_tools_spark.kernels import registry as r\n"
        "for fmt in r.FORMATS:\n"
        "    assert r.get_decoder(fmt) is r.builtin_decoder(fmt), fmt\n"
        "print('OK')\n")
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "OK"


# ---- round 8: encoder seam -------------------------------------------

def test_builtin_encoders_pass_their_own_contract():
    from archive_pdf_tools_spark.kernels import registry as R

    for fmt in R.ENCODER_FORMATS:
        R.verify_encoder(fmt, R.builtin_encoder(fmt))


def test_encoder_dropin_accepted_and_dispatched_by_sink():
    """A faithful drop-in encoder installs and the MRC sink actually
    calls it (marker side effect), with byte-identical output when the
    drop-in wraps the built-in."""
    import numpy as np

    from archive_pdf_tools_spark.kernels import registry as R
    from archive_pdf_tools_spark.kernels.pdfsink import build_mrc_pdf

    mask = np.zeros((24, 32), np.uint8)
    mask[6:12, 4:28] = 1
    gray = np.full((24, 32), 210, np.uint8)
    page = {"mask": mask, "bg": gray, "fg": 255 - gray}
    want = build_mrc_pdf([dict(page)])

    calls = {"jp2": 0, "jbig2": 0}

    def jp2_dropin(img, *, irreversible=False, step=None):
        calls["jp2"] += 1
        kw = {} if step is None else {"step": step}
        return R.builtin_encoder("JPEG2000")(
            img, irreversible=irreversible, **kw)

    def jbig2_dropin(bitmap):
        calls["jbig2"] += 1
        return R.builtin_encoder("JBIG2")(bitmap)

    try:
        R.register_encoder("JPEG2000", jp2_dropin)
        R.register_encoder("JBIG2", jbig2_dropin)
        calls["jp2"] = calls["jbig2"] = 0      # verify suite called it
        got = build_mrc_pdf([dict(page)])
        assert calls["jp2"] == 2 and calls["jbig2"] == 1
        assert got == want                     # faithful wrap: same bytes
    finally:
        R.reset_encoder()
    assert R.get_encoder("JPEG2000") is R.builtin_encoder("JPEG2000")


def test_encoder_dropin_rejected_when_corrupt_or_too_lossy():
    import numpy as np
    import pytest as _pytest

    from archive_pdf_tools_spark.kernels import registry as R

    # JBIG2: one flipped pixel on re-decode -> rejected
    def bad_jbig2(bitmap):
        bm = np.asarray(bitmap).copy()
        bm[0, 0] ^= 1
        return R.builtin_encoder("JBIG2")(bm)

    with _pytest.raises(R.ContractViolation, match="bit-exact"):
        R.register_encoder("JBIG2", bad_jbig2)

    # JP2: an encoder that throws away the image -> too lossy
    def flat_jp2(img, *, irreversible=False):
        return R.builtin_encoder("JPEG2000")(
            np.zeros_like(np.asarray(img)), irreversible=irreversible)

    with _pytest.raises(R.ContractViolation):
        R.register_encoder("JPEG2000", flat_jp2)

    # a crashing candidate reports, registry untouched
    def crash(img, *, irreversible=False):
        raise RuntimeError("boom")

    with _pytest.raises(R.ContractViolation, match="round-trip"):
        R.register_encoder("JPEG2000", crash)
    assert R.get_encoder("JPEG2000") is R.builtin_encoder("JPEG2000")


def test_encoder_dropin_rejected_without_sink_kwargs():
    """The sink's hq-pages lane calls the JP2 encoder with step= and
    the --jpeg-quality lane calls the JPEG encoder with quality=; a
    drop-in whose signature lacks the kwarg must fail registration,
    not explode later inside an executor (round-8 ADVICE)."""
    import pytest as _pytest

    from archive_pdf_tools_spark.kernels import registry as R

    def jp2_no_step(img, *, irreversible=False):
        return R.builtin_encoder("JPEG2000")(img,
                                             irreversible=irreversible)

    with _pytest.raises(R.ContractViolation, match="step="):
        R.register_encoder("JPEG2000", jp2_no_step)
    assert R.get_encoder("JPEG2000") is R.builtin_encoder("JPEG2000")

    def jpeg_no_quality(img):
        return R.builtin_encoder("JPEG")(img)

    with _pytest.raises(R.ContractViolation, match="quality="):
        R.register_encoder("JPEG", jpeg_no_quality)
    assert R.get_encoder("JPEG") is R.builtin_encoder("JPEG")


def test_encoder_exception_wrapping_is_typed():
    """An installed drop-in that later fails raises the format's typed
    error (a Jp2Error subclass), not a foreign exception."""
    from archive_pdf_tools_spark.kernels import registry as R
    from archive_pdf_tools_spark.kernels.jp2codec import Jp2Error

    state = {"armed": False}

    def flaky(img, *, irreversible=False, step=None):
        if state["armed"]:
            raise ValueError("transient")
        kw = {} if step is None else {"step": step}
        return R.builtin_encoder("JPEG2000")(
            img, irreversible=irreversible, **kw)

    try:
        R.register_encoder("JPEG2000", flaky)
        state["armed"] = True
        import numpy as np
        import pytest as _pytest
        with _pytest.raises(Jp2Error, match="drop-in"):
            R.get_encoder("JPEG2000")(np.zeros((8, 8), np.uint8))
    finally:
        R.reset_encoder()

"""GUI logic tests — display-free via gui_logic.GuiState, plus a
skip-guarded real-Tk smoke test.

The contract under test is the reference GUI's (mastering_gui.py):
preset application (159-177), the 15-key settings dict with the
long-spelling multiband keys and the unused ``compress`` (179-190),
busy gating on job start (192-222), and string-matched completion
(224-232).
"""

import os

import numpy as np
import pytest

from python_audio_mastering_tpu import MasteringParams, engine
from python_audio_mastering_tpu.gui_logic import (
    MB_SLIDERS,
    SLIDERS,
    GuiState,
    classify_status,
    default_output_path,
)
from python_audio_mastering_tpu.models.presets import EQ_PRESETS
from tests.conftest import make_signal


def test_settings_dict_matches_reference_shape():
    """mastering_gui.py:179-190: 13 sliders + multiband + compress."""
    st = GuiState()
    s = st.get_current_settings()
    expected_keys = {a for a, *_ in SLIDERS} | {a for a, *_ in MB_SLIDERS} \
        | {"multiband", "compress"}
    assert set(s) == expected_keys
    assert len([a for a, *_ in SLIDERS + MB_SLIDERS]) == 13
    assert s["compress"] is False
    assert s["multiband"] is False
    assert s["lufs"] == -14.0 and s["width"] == 1.0
    # long-spelling multiband keys are the GUI's wire format
    assert s["low_band_threshold"] == -25.0 and s["high_band_ratio"] == 4.0


def test_settings_feed_mastering_params():
    """The GUI dict (long spellings) maps onto the engine schema."""
    st = GuiState()
    st.set_value("low_band_threshold", -33.0)
    st.set_value("mid_band_ratio", 5.0)
    st.multiband = True
    p = MasteringParams.from_settings(st.get_current_settings())
    assert p.low_thresh == -33.0 and p.mid_ratio == 5.0
    assert p.multiband is True and p.lufs_enabled


def test_apply_preset_verbatim_and_none():
    st = GuiState()
    for name, vals in EQ_PRESETS.items():
        st.apply_preset(name)
        for k in ("bass_boost", "mid_cut", "presence_boost", "treble_boost"):
            assert st.values[k] == float(vals[k]), (name, k)
    st.apply_preset("None")
    assert all(st.values[k] == 0.0 for k in
               ("bass_boost", "mid_cut", "presence_boost", "treble_boost"))


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        GuiState().apply_preset("vaporwave")


def test_set_value_clamps_to_slider_range():
    st = GuiState()
    st.set_value("saturation", 250.0)
    assert st.values["saturation"] == 100.0
    st.set_value("lufs", -99.0)
    assert st.values["lufs"] == -24.0
    with pytest.raises(KeyError):
        st.set_value("gain_of_nonsense", 1.0)


def test_busy_gating_and_status_contract():
    st = GuiState()
    settings, err = st.start_single_job("in.wav", "out.wav")
    assert err is None and settings["input_file"] == "in.wav"
    assert st.busy
    # double-start refused while busy (mastering_gui.py:201-202 analog)
    s2, err2 = st.start_single_job("a.wav", "b.wav")
    assert s2 is None and "already running" in err2
    # progress keeps busy; terminal strings clear it (mastering_gui.py:226)
    assert st.on_status("Processed chunk 3/7...") == "progress" and st.busy
    assert st.on_status("Processing complete! Saved to out.wav") == "done"
    assert not st.busy
    # batch path + empty-folder message
    _, err3 = st.start_batch_job("", "outdir")
    assert "folder" in err3
    settings, err4 = st.start_batch_job("indir", "outdir")
    assert err4 is None and st.busy
    assert st.on_status("No audio files found in the input folder.") == "empty"
    assert not st.busy
    st.start_single_job("x.wav", "y.wav")
    assert st.on_status("ERROR: boom") == "error" and not st.busy


def test_classify_status_complete_beats_error():
    # reference precedence (mastering_gui.py:229-232): "complete" is
    # checked first — critically, a SUCCESS message embedding an output
    # path that contains "error" (".../error_analysis/out.wav") must not
    # demote the job to an Error dialog
    assert classify_status(
        "Processing complete! Saved to /data/error_analysis/out.wav") == "done"
    assert classify_status("ERROR: decode failed") == "error"
    assert classify_status("Batch processing complete! 3/3") == "done"
    assert classify_status("no audio files") == "empty"
    assert classify_status("Loading x.wav...") == "progress"


def test_default_output_path():
    assert default_output_path("/a/b/track.wav") == "/a/b/track_mastered.wav"
    assert default_output_path("t.mp3") == "t_mastered.mp3"


def test_gui_state_drives_engine_end_to_end(tmp_path):
    """The full desktop flow, headless: GuiState settings -> engine ->
    terminal status string -> busy cleared."""
    from python_audio_mastering_tpu import ChainConfig
    from python_audio_mastering_tpu.io import wavio

    fs = 44100
    x = (make_signal(fs) * 0.4).astype(np.float32)
    in_path = str(tmp_path / "in.wav")
    wavio.write_wav(in_path, x, fs)

    st = GuiState()
    st.apply_preset("pop")
    st.set_value("saturation", 15.0)
    settings, err = st.start_single_job(in_path, str(tmp_path / "out.wav"))
    assert err is None
    msgs = []

    def cb(m):
        msgs.append(m)
        st.on_status(m)

    ok = engine.process_audio(
        settings, cb, config=ChainConfig(sample_rate=fs, dtype="float32"))
    assert ok and not st.busy
    assert any(classify_status(m) == "done" for m in msgs)
    out, fs2 = wavio.read_wav(str(tmp_path / "out.wav"))
    assert fs2 == fs and np.isfinite(out).all()


@pytest.mark.skipif(not os.environ.get("DISPLAY"),
                    reason="no display server")
def test_real_tk_app_settings_roundtrip():
    from python_audio_mastering_tpu.gui import MasteringApp

    app = MasteringApp()
    try:
        app.vars["saturation"].set(30.0)
        app.use_multiband.set(True)
        s = app.get_current_settings()
        assert s["saturation"] == 30.0 and s["multiband"] is True
        assert s["compress"] is False
    finally:
        app.destroy()


def test_automaster_job_validation_and_busy_gate():
    from python_audio_mastering_tpu.gui_logic import GuiState

    st = GuiState()
    s, err = st.start_automaster_job("", "ref.wav", "out.wav")
    assert s is None and "select" in err.lower()
    s, err = st.start_automaster_job("in.wav", "ref.wav", "out.wav")
    assert err is None and st.busy
    assert s["input_file"] == "in.wav"
    assert s["reference_file"] == "ref.wav"
    assert s["output_file"] == "out.wav"
    # busy gate blocks a second job until a terminal status arrives
    s2, err2 = st.start_automaster_job("a.wav", "b.wav", "c.wav")
    assert s2 is None and "already running" in err2
    assert st.on_status("Processing complete! Saved to out.wav") == "done"
    assert not st.busy


def test_apply_fitted_settings_clamps_to_slider_ranges():
    from python_audio_mastering_tpu.gui_logic import (
        AUTOMASTER_KEYS, GuiState)

    st = GuiState()
    fitted = {"saturation": 35.0, "bass_boost": 2.5, "mid_cut": -3.0,
              "presence_boost": 9.0, "treble_boost": 1.0, "width": 1.4,
              "lufs": -14.0, "multiband": False}
    applied = st.apply_fitted_settings(fitted)
    assert set(applied) == set(AUTOMASTER_KEYS)
    assert st.values["saturation"] == 35.0
    assert st.values["mid_cut"] == 0.0       # clamped: slider floor is 0
    assert st.values["presence_boost"] == 6.0  # clamped: slider cap is 6
    assert st.values["width"] == 1.4
    assert st.preset == "None"


def test_automaster_engine_end_to_end(tmp_path):
    """The automaster engine fits finite slider values, writes the output,
    and finishes with a 'complete' message (the GUI completion contract)."""
    import numpy as np

    from python_audio_mastering_tpu import engine
    from python_audio_mastering_tpu.config import ChainConfig
    from python_audio_mastering_tpu.io import wavio
    from tests.conftest import make_signal

    fs = 44100
    x = (make_signal(fs, fs=fs) * 0.3).astype(np.float32)
    ref = (make_signal(fs, fs=fs, seed=5) * 0.5).astype(np.float32)
    wavio.write_wav(tmp_path / "in.wav", x, fs)
    wavio.write_wav(tmp_path / "ref.wav", ref, fs)
    msgs = []
    fitted = engine.automaster_audio(
        {"input_file": str(tmp_path / "in.wav"),
         "reference_file": str(tmp_path / "ref.wav"),
         "output_file": str(tmp_path / "out.wav"),
         "lufs": -16.0},
        status_callback=msgs.append,
        config=ChainConfig(sample_rate=fs, filter_method="blocked",
                           block_size=256, comp_hop=8, comp_block_ctrl=256),
        steps=3)
    assert fitted is not None
    assert all(np.isfinite(v) for v in fitted.values()
               if isinstance(v, float))
    assert (tmp_path / "out.wav").exists()
    assert any("complete" in m.lower() for m in msgs)
    assert any("Fitting" in m for m in msgs)

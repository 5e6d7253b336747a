"""CLI surface tests (argument wiring, verbs, exit codes)."""

import numpy as np
import pytest

from python_audio_mastering_tpu import cli
from python_audio_mastering_tpu.io import wavio
from tests.conftest import make_signal

FS = 44100


@pytest.fixture
def in_wav(tmp_path):
    path = str(tmp_path / "in.wav")
    wavio.write_wav(path, (make_signal(FS // 2) * 0.4).astype(np.float32), FS)
    return path


def test_master_verb(tmp_path, in_wav, capsys):
    out = str(tmp_path / "out.wav")
    rc = cli.main(["master", in_wav, out, "--preset", "techno",
                   "--saturation", "15", "--lufs", "-15", "--exact"])
    assert rc == 0
    y, fs = wavio.read_wav(out)
    assert fs == FS and y.shape[1] == 2
    assert "complete" in capsys.readouterr().out.lower()


def test_master_no_lufs_and_multiband_flags(tmp_path, in_wav):
    out = str(tmp_path / "o2.wav")
    rc = cli.main(["master", in_wav, out, "--no-lufs", "--multiband",
                   "--low-thresh", "-30", "--exact"])
    assert rc == 0


def test_measure_verb(in_wav, capsys):
    rc = cli.main(["measure", in_wav])
    assert rc == 0
    out = capsys.readouterr().out
    assert "LUFS" in out and "dBTP" in out


def test_batch_verb(tmp_path, in_wav, capsys):
    import shutil

    in_dir = tmp_path / "batchin"
    in_dir.mkdir()
    shutil.copy(in_wav, in_dir / "a.wav")
    shutil.copy(in_wav, in_dir / "b.wav")
    rc = cli.main(["batch", str(in_dir), str(tmp_path / "batchout"),
                   "--preset", "pop", "--exact"])
    assert rc == 0
    assert sorted(p.name for p in (tmp_path / "batchout").iterdir()) == \
        ["a_mastered.wav", "b_mastered.wav"]


def test_batch_empty_folder_fails(tmp_path):
    (tmp_path / "empty").mkdir()
    rc = cli.main(["batch", str(tmp_path / "empty"), str(tmp_path / "o")])
    assert rc == 1


def test_missing_input_returns_error(tmp_path, capsys):
    rc = cli.main(["master", str(tmp_path / "nope.wav"),
                   str(tmp_path / "o.wav")])
    assert rc == 1


def test_cli_resample(tmp_path):
    import numpy as np

    from python_audio_mastering_tpu import cli
    from python_audio_mastering_tpu.io import wavio

    fs = 44100
    t = np.arange(fs) / fs
    x = np.stack([np.sin(2 * np.pi * 440 * t)] * 2, axis=1).astype(np.float32)
    src = tmp_path / "in.wav"
    dst = tmp_path / "out.wav"
    wavio.write_wav(str(src), x, fs)
    rc = cli.main(["resample", str(src), str(dst), "--rate", "48000"])
    assert rc == 0
    y, fs_out = wavio.read_wav(str(dst))
    assert fs_out == 48000
    assert y.shape[0] == -(-fs * 160 // 147)


def test_cli_master_output_rate(tmp_path, in_wav):
    from python_audio_mastering_tpu import cli
    from python_audio_mastering_tpu.io import wavio

    out = str(tmp_path / "m48.wav")
    rc = cli.main(["master", in_wav, out, "--no-lufs", "--exact",
                   "--output-rate", "48000"])
    assert rc == 0
    y, fs = wavio.read_wav(out)
    assert fs == 48000


def test_cli_resample_float_width(tmp_path):
    """--width float writes IEEE-float WAV (no 16-bit quantization)."""
    import numpy as np

    from python_audio_mastering_tpu import cli
    from python_audio_mastering_tpu.io import wavio

    fs = 44100
    x = (np.random.default_rng(0).standard_normal((fs, 2)) * 1e-4) \
        .astype(np.float32)
    src = tmp_path / "tiny.wav"
    dst = tmp_path / "tiny48.wav"
    wavio.write_wav(str(src), x, fs, float_format=True)
    rc = cli.main(["resample", str(src), str(dst), "--rate", "48000",
                   "--width", "float"])
    assert rc == 0
    y, fs_out = wavio.read_wav(str(dst))
    assert fs_out == 48000
    # -84 dBFS content survives: 16-bit quantization would destroy it
    # (1 LSB = 3e-5), float container keeps it to float32 precision
    assert np.abs(y).max() > 5e-5
    assert np.std(y) > 1e-5


def test_cli_album(tmp_path):
    """`album`: the whole folder masters as one batched device call, with
    per-track measured LUFS and the folder-batch completion message."""
    import numpy as np

    from python_audio_mastering_tpu import cli
    from python_audio_mastering_tpu.io import wavio
    from tests.conftest import make_signal

    fs = 44100
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(2):
        x = (make_signal(int(fs * (0.8 + 0.2 * i)), seed=i) * 0.4) \
            .astype(np.float32)
        wavio.write_wav(str(in_dir / f"t{i}.wav"), x, fs)
    out_dir = tmp_path / "out"
    rc = cli.main(["album", str(in_dir), str(out_dir), "--preset", "pop",
                   "--lufs", "-16", "--exact"])
    assert rc == 0
    for i in range(2):
        y, fs_out = wavio.read_wav(str(out_dir / f"t{i}_mastered.wav"))
        assert fs_out == fs and np.isfinite(y).all()

    rc = cli.main(["album", str(tmp_path / "nope"), str(out_dir)])
    assert rc == 1


def test_cli_master_quality_flag(tmp_path, in_wav):
    from python_audio_mastering_tpu import cli
    from python_audio_mastering_tpu.io import wavio
    from python_audio_mastering_tpu.ops import meters as met

    out = str(tmp_path / "q.wav")
    rc = cli.main(["master", in_wav, out, "--lufs", "-9", "--exact",
                   "--quality"])
    assert rc == 0
    y, _ = wavio.read_wav(out)
    assert float(met.true_peak_db(y)) <= -0.8

"""CSV/XLSX interchange tests."""

import os

import numpy as np
import pandas as pd

from ysmr_tpu.utils.csv_io import (collate_results_csv_to_xlsx, different_tracks,
                                   get_data, save_df_to_csv, save_list, sort_list)


def _write_list_csv(tmp_path, rows):
    path = str(tmp_path / 'vid_list.csv')
    with open(path, 'w') as f:
        f.write('TRACK_ID,POSITION_T,POSITION_X,POSITION_Y,WIDTH,HEIGHT,DEGREES_ANGLE\n')
        for r in rows:
            f.write(','.join(str(v) for v in r) + '\n')
    return path


def test_save_list_first_call_and_append(tmp_path):
    video = str(tmp_path / 'movie.avi')
    old, csv_path = save_list(path=video, result_folder=str(tmp_path), first_call=True)
    assert old is False
    assert os.path.isfile(csv_path)
    # tuple (reference-style) append
    coords = [(0, 0, np.array([1.5, 2.5]), (3.0, 4.0, 45.0)),
              (0, 1, np.array([7.5, 8.5]), (2.0, 5.0, 10.0))]
    save_list(coords=coords, path=csv_path)
    # packed-array append
    arrays = {
        'TRACK_ID': np.array([0, 1]),
        'POSITION_T': np.array([1, 1]),
        'POSITION_X': np.array([1.6, 7.6]),
        'POSITION_Y': np.array([2.6, 8.6]),
        'WIDTH': np.array([3.0, 2.0]),
        'HEIGHT': np.array([4.0, 5.0]),
        'DEGREES_ANGLE': np.array([45.0, 10.0]),
    }
    save_list(arrays=arrays, path=csv_path)
    df = pd.read_csv(csv_path)
    assert df.shape == (4, 7)
    assert df['POSITION_X'].tolist() == [1.5, 7.5, 1.6, 7.6]


def test_get_data_sorts_unsorted(tmp_path):
    # frame-major rows: first six TRACK_IDs unique triggers the sort heuristic
    rows = [(tid, t, 10.0 * tid + t, 1.0, 2.0, 3.0, 0.0)
            for t in range(3) for tid in range(6)]
    path = _write_list_csv(tmp_path, rows)
    df = get_data(path)
    assert df is not None
    assert (df['TRACK_ID'].diff().fillna(0) >= 0).all()
    by_track = df.groupby('TRACK_ID')['POSITION_T'].apply(lambda s: s.is_monotonic_increasing)
    assert by_track.all()


def test_different_tracks():
    df = pd.DataFrame({'TRACK_ID': [0, 0, 0, 1, 1, 4, 4, 4, 4]})
    starts, stops = different_tracks(df)
    assert starts == [0, 3, 5]
    assert stops == [2, 4, 8]


def test_sort_list_save_roundtrip(tmp_path):
    rows = [(1, 1, 5.0, 1.0, 2.0, 3.0, 0.0), (0, 0, 1.0, 1.0, 2.0, 3.0, 0.0),
            (0, 1, 2.0, 1.0, 2.0, 3.0, 0.0), (1, 0, 4.0, 1.0, 2.0, 3.0, 0.0),
            (2, 0, 9.0, 1.0, 2.0, 3.0, 0.0), (2, 1, 9.5, 1.0, 2.0, 3.0, 0.0)]
    path = _write_list_csv(tmp_path, rows)
    df = sort_list(file_path=path, save_file=True)
    assert df['TRACK_ID'].tolist() == [0, 0, 1, 1, 2, 2]
    df2 = pd.read_csv(path)
    assert df2['POSITION_X'].tolist() == [1.0, 2.0, 4.0, 5.0, 9.0, 9.5]


def test_collate_xlsx_roundtrip(tmp_path):
    stats = pd.DataFrame({'Speed (µm/s)': [1.25, 2.5], 'TRACK_ID': [0, 1],
                          'Motility Phenotype': [2, 0]})
    save_df_to_csv(stats, str(tmp_path / 'a_statistics.csv'), rename_old_file=False)
    save_df_to_csv(stats * 2, str(tmp_path / 'b_statistics.csv'), rename_old_file=False)
    out = collate_results_csv_to_xlsx(path=str(tmp_path), save_path=str(tmp_path))
    assert out and os.path.isfile(out)
    sheets = pd.read_excel(out, sheet_name=None, engine='openpyxl') \
        if _has_openpyxl() else None
    if sheets is not None:
        assert len(sheets) == 2
    else:  # no reader available: validate the zip structure manually
        import zipfile
        with zipfile.ZipFile(out) as zf:
            names = zf.namelist()
            assert 'xl/workbook.xml' in names
            assert 'xl/worksheets/sheet1.xml' in names
            assert 'xl/worksheets/sheet2.xml' in names
            sheet1 = zf.read('xl/worksheets/sheet1.xml').decode()
            assert '1.25' in sheet1


def _has_openpyxl():
    try:
        import openpyxl  # noqa: F401
        return True
    except ImportError:
        return False


def test_metadata_file_roundtrip(tmp_path):
    from ysmr_tpu.utils.files import metadata_file
    base = str(tmp_path / 'movie.avi')
    meta = metadata_file(path=base, fps=30.0, frame_height=922, frame_width=1228,
                         nothing=None)
    assert meta == {'fps': 30.0, 'frame_height': 922, 'frame_width': 1228}
    # read back via a derived artifact name; new kwargs win
    meta2 = metadata_file(path=str(tmp_path / 'movie_list.csv'), fps=60.0)
    assert meta2['fps'] == 60.0
    assert meta2['frame_height'] == 922


def test_check_logfile_rollover(tmp_path):
    from ysmr_tpu.utils.logging_utils import check_logfile
    log = str(tmp_path / 'run.log')
    with open(log, 'w') as f:
        f.write('x' * 2048)
    check_logfile(log, max_size=1024)
    assert os.path.isfile(log + '.1')
    assert not os.path.isfile(log)


def test_fast_df_csv_bytes_matches_pandas(tmp_path):
    """The native typed-column CSV writer must produce byte-identical output
    to pandas.DataFrame.to_csv(index=False) across every dtype the pipeline
    artifacts use (uint32/int32/int8 ints, float64 with NaN, float16, bool,
    strings) — it replaces pandas on the dense-scene hot path."""
    import io
    import numpy as np
    import pandas as pd
    from ysmr_tpu import native
    from ysmr_tpu.utils.csv_io import _fast_df_csv_bytes
    if not native.available():
        import pytest
        pytest.skip('native library not built')
    rng = np.random.default_rng(11)
    n = 20000
    f64 = rng.uniform(-1300, 1300, n)
    f64[::5] = np.round(f64[::5])          # integral floats -> '.0'
    f64[::97] = np.nan                     # pandas renders ""
    f64[1] = 1.5e-5                        # scientific, two-digit exponent
    f64[2] = 0.0001                        # positional boundary
    f64[3] = 9.999e-5                      # scientific just below it
    f64[4] = 1e15                          # positional upper range
    f64[6] = 2e16                          # scientific upper range
    f64[7] = -0.0                          # signed zero
    df = pd.DataFrame({
        'TRACK_ID': rng.integers(0, 4000, n).astype(np.uint32),
        'POSITION_T': rng.integers(0, 630, n).astype(np.int32),
        'POSITION_X (µm)': f64,
        'bac_length': rng.uniform(0, 30, n).astype(np.float16),
        'moving': rng.integers(0, 2, n).astype(np.int8),
        'flag': rng.integers(0, 2, n).astype(bool),
        'Motility Phenotype': np.array(['motile', 'immotile', 'twitching'])[
            rng.integers(0, 3, n)],
    })
    fast = _fast_df_csv_bytes(df)
    assert fast is not None
    buf = io.StringIO()
    df.to_csv(buf, index=False)
    assert fast == buf.getvalue().encode('utf-8')

    # columns pandas must keep handling fall back (None), not crash
    assert _fast_df_csv_bytes(
        pd.DataFrame({'x': np.zeros(4, np.float32)})) is None
    assert _fast_df_csv_bytes(
        pd.DataFrame({'s': ['a', 'with,comma']})) is None
    assert _fast_df_csv_bytes(pd.DataFrame({'s': ['a', '']})) is None

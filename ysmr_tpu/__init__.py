"""ysmr_tpu — TPU-native bacterial video tracking and motility analysis.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of schwanbeck/YSMR
(see SURVEY.md): per-frame OpenCV detection becomes fused device kernels,
the centroid tracker + Gaussian-Sum FIR filter become a batched ``lax.scan``
over persistent track state, and the pandas selection/statistics pipeline is
preserved as the public interchange surface.

Public API mirrors the reference package (ysmr/__init__.py): ``ysmr``,
``analyse``, the pipeline stages, and the plot functions.
"""

import os as _os

# persistent XLA compilation cache: first compiles of the detection/tracking
# programs are expensive (tens of seconds on TPU); cache them across runs
_os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                       _os.path.expanduser('~/.cache/ysmr_tpu_jax'))
_os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

from ysmr_tpu.__version__ import VERSION, __version__  # noqa: F401

try:  # full pipeline (requires jax); config/util layers import without it
    from ysmr_tpu.main import analyse, ysmr  # noqa: F401
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria  # noqa: F401
    from ysmr_tpu.pipeline.select import select_tracks  # noqa: F401
    from ysmr_tpu.pipeline.evaluate import evaluate_tracks  # noqa: F401
    from ysmr_tpu.pipeline.annotate import annotate_video  # noqa: F401
    from ysmr_tpu.plot_functions import (angle_distribution_plot, large_xy_plot,  # noqa: F401
                                         rose_graph, violin_plot)
    __all__ = ['ysmr', 'analyse', 'track_bacteria', 'select_tracks', 'evaluate_tracks',
               'annotate_video', 'angle_distribution_plot', 'large_xy_plot',
               'rose_graph', 'violin_plot', 'VERSION', '__version__']
except ImportError:  # pragma: no cover - partial builds during bring-up
    __all__ = ['VERSION', '__version__']

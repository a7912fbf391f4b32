"""Decoder plugins — importable codec modules for the multimodal
registry (sources/multimodal.IMAGE_DECODERS / FRAME_DECODERS).

The registry's contract for REAL deployments: a plugin lives in an
importable package module (this one, or any site-packages dist), and its
``register()`` runs once at session start on the driver. Stages snapshot
the registry into their Arrow-batch closures; a module-level callable
pickles BY REFERENCE, so each executor's Python worker re-imports the
plugin module — the path a test-local nested function cannot exercise
(it ships by value instead). :mod:`plugins.ppm_codec` is the in-tree
proof of that seam: a genuine public image format (netpbm PPM/PGM) the
builtin codec set refuses, decoded on executors through the public
registry only. Its docstring carries the recipe for dropping an
ffmpeg-backed plugin into the identical seam.
"""

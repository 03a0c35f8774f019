from trinity_ray.index.build import build_index  # noqa: F401
from trinity_ray.index.segment import (  # noqa: F401
    IndexManifest,
    SegmentMeta,
    read_manifest,
    write_manifest,
)

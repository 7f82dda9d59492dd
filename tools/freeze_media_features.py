"""Regenerate the frozen VALUES oracle for media_features_real.

The fixture (multimodal.synth_uncompressed_media) is a pure function of
media_id and the decoder is deterministic numpy, so the features freeze as
literals. FLOAT4 casts make DuckDB reproduce Spark's float32 widening
bit-exactly (same pattern as the frozen IVF centroids).

Usage: python tools/freeze_media_features.py [dim]   # prints the SQL
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from ant_spark.operators.multimodal import _real_decode, synth_uncompressed_media  # noqa: E402


def main() -> None:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pdf = synth_uncompressed_media()
    lines = []
    for r in pdf.itertuples():
        feats = _real_decode(bytes(r.payload), dim)
        f32 = [repr(float(np.float32(v))) for v in feats]
        lines.append(
            f"              ({r.media_id}, '{r.kind}', {len(r.payload)}, "
            f"[{', '.join(v + '::DOUBLE::FLOAT4' for v in f32)}])"
        )
    print("            SELECT media_id::BIGINT AS media_id, kind,")
    print("                   n_bytes::BIGINT AS n_bytes, feature")
    print("            FROM (VALUES")
    print(",\n".join(lines))
    print("            ) AS t(media_id, kind, n_bytes, feature)")


if __name__ == "__main__":
    main()

"""Generate the ~20k-vertex scaled template by midpoint subdivision:
python -m meshvae_tpu.tools.make_scaled_template [src.obj] [dst.obj]"""
import sys

from ..mesh.io import load_obj, save_obj
from ..mesh.subdivide import subdivide_midpoint


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "./template/template5k.obj"
    dst = sys.argv[2] if len(sys.argv) > 2 else "./template/template20k.obj"
    mesh = subdivide_midpoint(load_obj(src))
    import os
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    save_obj(dst, mesh.v, mesh.f)
    print(f"wrote {dst}: {mesh.num_vertices} vertices, "
          f"{mesh.num_faces} faces")


if __name__ == "__main__":
    main()

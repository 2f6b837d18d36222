#!/usr/bin/env python
"""Local interactive viewer for trained models.

The analogue of the reference's ``SIBR_gaussianViewer_app -m <model>``
(reference README.md:296-302), rebuilt for headless TPU hosts: a browser
viewer served over HTTP, rendering frames through the jitted Pallas
inference path. Open the printed URL (tunnel the port if remote).

    python view.py -m output/<run> [--iteration 30000] [--port 8080]
"""

import argparse

from gsjax.utils.system import safe_state


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()
    safe_state(args.quiet)

    from gsjax.viewer.local_viewer import viewer_from_model

    viewer_from_model(
        args.model_path, iteration=args.iteration,
        host=args.host, port=args.port,
    ).serve_forever()


if __name__ == "__main__":
    main()

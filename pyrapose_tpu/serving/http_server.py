"""HTTP pose-estimation server (stdlib http.server, no extra deps).

The TPU-native counterpart of the reference's ROS service mode
(PyraPose_ROS_wrapper/pyrapose_node.py PoseEstimationServer, :354-507):
load once, answer pose queries. For non-ROS deployments:

    POST /poses        body = PNG/JPEG image -> {"poses": [...]}
    GET  /healthz      liveness probe

Response pose records carry obj_id, score, translation (meters) and wxyz
quaternion — the same payload as the reference's PoseWithConfidence message
(msg/PoseWithConfidence.msg: name, pose, confidence).
"""

from __future__ import annotations

import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from pyrapose_tpu.serving.engine import PoseEstimator


def make_handler(estimator: PoseEstimator):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/poses":
                self._reply(404, {"error": "not found"})
                return
            try:
                from PIL import Image

                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                img = Image.open(io.BytesIO(raw)).convert("RGB")
                h, w = estimator.spec.image_shape
                if img.size != (w, h):
                    img = img.resize((w, h))
                image = np.asarray(img, np.uint8)
            except Exception as exc:  # malformed body -> 400, not a crash
                self._reply(400, {"error": f"bad image: {exc}"})
                return
            results = estimator.estimate(image)
            poses = [
                {
                    "name": f"obj_{r['obj_id']:06d}",
                    "obj_id": int(r["obj_id"]),
                    "confidence": r["score"],
                    "translation": r["trans"].tolist(),
                    "quaternion_wxyz": r["quat"].tolist(),
                }
                for r in results
            ]
            self._reply(200, {"poses": poses})

    return Handler


def serve(estimator: PoseEstimator, host: str = "127.0.0.1", port: int = 8321):
    """Blocking serve loop."""
    server = ThreadingHTTPServer((host, port), make_handler(estimator))
    print(f"pyrapose serving on http://{host}:{port} (POST /poses)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()

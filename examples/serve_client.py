"""Client for annonet_serve — stdlib only.

Start the server (once, keeps compiled programs warm across requests):

    annonet_serve --model annonet.dnn --port 8096 --quantize int8 \
        --warmup 2048x2048

Then from any process/machine:

    python examples/serve_client.py http://127.0.0.1:8096 image.png \
        [out.png] [gain=1:-0.5 ...]
"""

import json
import sys
import urllib.request


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    base, image_path = sys.argv[1].rstrip("/"), sys.argv[2]
    out_path = None
    params = []
    for arg in sys.argv[3:]:
        if "=" in arg and arg.split("=", 1)[0] in ("gain", "detection",
                                                   "format"):
            params.append(arg)
        else:
            out_path = arg
    out_path = out_path or image_path + "_result.png"

    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    print(f"model: {info['model']}  classes:",
          [c["label"] for c in info["classes"]])

    with open(image_path, "rb") as f:
        body = f.read()
    query = ("?" + "&".join(params)) if params else ""
    req = urllib.request.Request(
        base + "/infer" + query, data=body, method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        print(f"inference: {r.headers.get('X-Inference-Ms', '?')} ms")
        result = r.read()
        content_type = r.headers["Content-Type"]

    if content_type == "image/png":
        with open(out_path, "wb") as f:
            f.write(result)
        print(f"wrote {out_path}")
    else:
        print(result.decode("utf-8", "replace")[:2000])
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Result gallery server (reference tools/viewer/server.py, Flask, 141 LoC) —
stdlib http.server edition: browse generated mp4/png trees.

Usage: python tools/viewer/server.py --root outputs/ [--port 8000]
"""
from __future__ import annotations

import argparse
import html
import os
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

PAGE = """<!doctype html><html><head><title>MagicDrive-V2 viewer</title>
<style>body{{font-family:sans-serif;margin:2em}} .g{{display:flex;flex-wrap:wrap;gap:1em}}
.c{{max-width:520px}} video,img{{width:100%;border-radius:6px}}</style></head>
<body><h2>{title}</h2><div class="g">{cells}</div></body></html>"""


class Handler(SimpleHTTPRequestHandler):
    def do_GET(self):
        path = unquote(self.path.split("?")[0]).lstrip("/")
        full = os.path.join(self.directory, path)
        if os.path.isdir(full):
            cells = []
            for name in sorted(os.listdir(full)):
                rel = os.path.join(path, name)
                if name.endswith(".mp4"):
                    cells.append(f'<div class="c"><video controls loop muted '
                                 f'src="/{rel}"></video><div>{html.escape(name)}'
                                 f"</div></div>")
                elif name.endswith((".png", ".jpg")):
                    cells.append(f'<div class="c"><img src="/{rel}">'
                                 f"<div>{html.escape(name)}</div></div>")
                elif os.path.isdir(os.path.join(full, name)):
                    cells.append(f'<div class="c"><a href="/{rel}/">{html.escape(name)}'
                                 f"/</a></div>")
            body = PAGE.format(title=html.escape("/" + path), cells="".join(cells))
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        return super().do_GET()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="outputs")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args()
    handler = lambda *a, **kw: Handler(*a, directory=os.path.abspath(args.root), **kw)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), handler)
    print(f"viewing {args.root} at http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

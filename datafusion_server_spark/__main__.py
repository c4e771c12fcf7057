"""``python -m datafusion_server_spark`` — start the REST (+ optional
Flight) server."""

from __future__ import annotations

import argparse
import threading


def main() -> None:
    p = argparse.ArgumentParser(description="datafusion-server-spark")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=4000)
    p.add_argument("--flight-port", type=int, default=0, help="0 disables Flight")
    args = p.parse_args()

    from datafusion_server_spark.server.api import Engine
    from datafusion_server_spark.server.http import serve

    engine = Engine()
    httpd = serve(engine, args.host, args.port)
    print(f"REST:   http://{args.host}:{httpd.server_address[1]}")
    if args.flight_port:
        from datafusion_server_spark.server import flight

        flight.serve(engine, f"grpc://{args.host}:{args.flight_port}")
        print(f"Flight: grpc://{args.host}:{args.flight_port}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()

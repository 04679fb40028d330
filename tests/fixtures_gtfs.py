"""Deterministic GTFS-domain fixtures per FIXTURES.md §1.

Generates the reference's bronze input shapes: four static CSV files
(a GTFS zip-extract lookalike) and nested RT feed snapshots (JSON),
with the documented null rates and the >24:00:00 service-time trap.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random

N_ROUTES = 8
N_STOPS = 40
N_TRIPS = 60
STOPS_PER_TRIP = 10
BASE_DATE = dt.datetime(2024, 3, 4)  # a Monday


def _rng() -> random.Random:
    return random.Random(42)


def write_static_csvs(data_dir: str) -> None:
    rng = _rng()
    os.makedirs(data_dir, exist_ok=True)

    with open(os.path.join(data_dir, "routes.txt"), "w") as f:
        f.write("route_id,agency_id,route_short_name,route_long_name,"
                "route_type,route_url,route_color,route_text_color\n")
        for i in range(N_ROUTES):
            url = "" if rng.random() < 0.1 else f"http://ex.org/r{i}"
            color = "NULL" if rng.random() < 0.1 else "0000FF"
            f.write(f"R{i},LA,{i},\"Terminus A — Terminus B {i}\","
                    f"{rng.choice([0, 3])},{url},{color},FFFFFF\n")

    with open(os.path.join(data_dir, "trips.txt"), "w") as f:
        f.write("route_id,service_id,trip_id,trip_headsign,trip_short_name,"
                "direction_id,shape_id,wheelchair_accessible,bike_allowed\n")
        for i in range(N_TRIPS):
            headsign = "" if rng.random() < 0.05 else f"Dest {i % 5}"
            short = "" if rng.random() < 0.5 else f"T{i}"
            direction = "" if rng.random() < 0.05 else str(i % 2)
            shape = "" if rng.random() < 0.1 else f"S{i % 7}"
            f.write(f"R{i % N_ROUTES},Semaine,6444367-{i}_R_99,{headsign},"
                    f"{short},{direction},{shape},{rng.choice([0, 1, 2])},"
                    f"{rng.choice([0, 1, 2])}\n")

    with open(os.path.join(data_dir, "stops.txt"), "w") as f:
        f.write("stop_id,stop_code,stop_name,stop_lat,stop_lon,zone_id,"
                "location_type,parent_station,stop_timezone,wheelchair_boarding\n")
        for i in range(N_STOPS):
            zone = "" if rng.random() < 0.3 else "Z1"
            parent = "" if rng.random() < 0.8 else f"{1000 + i // 10}"
            tz = "" if rng.random() < 0.5 else "Europe/Paris"
            f.write(f"{1271 + i},C{i},\"Arrêt {i}\","
                    f"{43.70 + rng.uniform(-0.1, 0.1):.6f},"
                    f"{7.27 + rng.uniform(-0.1, 0.1):.6f},{zone},0,{parent},"
                    f"{tz},{rng.choice([0, 1, 2])}\n")

    with open(os.path.join(data_dir, "stop_times.txt"), "w") as f:
        f.write("trip_id,arrival_time,departure_time,stop_id,stop_sequence,"
                "pickup_type,drop_off_type\n")
        for i in range(N_TRIPS):
            # late trips start near midnight -> times roll past 24:00:00
            start = 5 * 3600 + (i % 20) * 3600 + (3600 * 19 if i % 10 == 9 else 0)
            for seq in range(1, STOPS_PER_TRIP + 1):
                arr = start + seq * 120
                dep = arr + 30
                def hms(s: int) -> str:
                    return f"{s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}"
                a = "" if rng.random() < 0.02 else hms(arr)
                d = "" if (a and rng.random() < 0.02) else hms(dep)
                stop = 1271 + (i * 3 + seq) % N_STOPS
                f.write(f"6444367-{i}_R_99,{a},{d},{stop},{seq},0,0\n")


def make_feed_snapshots(n_snapshots: int = 3) -> list[str]:
    """RT feed snapshots as FeedMessage-shaped JSON strings, with
    duplicate trip entities (first-wins test), missing optional fields
    and out-of-order vehicle timestamps per FIXTURES.md."""
    rng = _rng()
    snaps = []
    for s in range(n_snapshots):
        base_epoch = int(BASE_DATE.timestamp()) + 6 * 3600 + s * 120
        entities = []
        for i in range(0, N_TRIPS, 2):
            trip_id = f"6444367-{i}_R_99"
            stus = []
            for seq in range(1, STOPS_PER_TRIP + 1):
                if rng.random() < 0.1:
                    continue  # feed gap (README.md:137-138)
                sched = 5 * 3600 + (i % 20) * 3600 + seq * 120
                delay = max(-300, int(rng.gauss(120, 180)))
                stu = {"arrival": {"time": int(BASE_DATE.timestamp()) + sched + delay}}
                if rng.random() > 0.05:
                    stu["stop_sequence"] = seq
                if rng.random() > 0.10:
                    stu["stop_id"] = str(1271 + (i * 3 + seq) % N_STOPS)
                if rng.random() > 0.3:
                    stu["departure"] = {"time": stu["arrival"]["time"] + 30}
                stus.append(stu)
            trip = {"trip_id": trip_id, "route_id": f"R{i % N_ROUTES}"}
            if rng.random() > 0.15:
                trip["direction_id"] = i % 2
            entities.append({"id": f"tu-{i}",
                             "trip_update": {"trip": trip,
                                             "stop_time_update": stus}})
            if rng.random() < 0.2:  # duplicate trip entity, first wins
                entities.append({"id": f"tu-{i}-dup",
                                 "trip_update": {"trip": dict(trip, route_id="DUP"),
                                                 "stop_time_update": stus[:1]}})
        # entity without trip_id: no header row, but its stop rows land
        # with NULL trip_id (gtfs_rt_minutely.py:93,109)
        entities.append({"id": "tu-null",
                         "trip_update": {"trip": {"route_id": "R0"},
                                         "stop_time_update": [
                                             {"stop_sequence": 1,
                                              "arrival": {"time": base_epoch}}]}})
        for v in range(12):
            i = (v * 5) % N_TRIPS
            veh = {
                "trip": {"trip_id": f"6444367-{i}_R_99", "route_id": f"R{i % N_ROUTES}"},
                "position": {"latitude": 43.7 + v * 1e-3,
                             "longitude": 7.27 - v * 1e-3,
                             "bearing": rng.uniform(0, 359)},
                "vehicle": {"id": f"V{v % 6}"},
                # out-of-order + duplicate timestamps (late-data test)
                "timestamp": base_epoch - rng.choice([0, 0, 60, 240]),
            }
            if rng.random() < 0.15:
                veh.pop("stop_id", None)
            else:
                veh["stop_id"] = str(1271 + v)
            if rng.random() < 0.1:
                veh["position"].pop("bearing")
            entities.append({"id": f"vp-{v}", "vehicle": veh})
        snaps.append(json.dumps({"entity": entities}))
    return snaps

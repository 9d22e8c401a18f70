#!/usr/bin/env python3
"""Python mirror of GeoClip.scala (same double arithmetic, same operation
order) used to compute the literal pins in q_kql_geo_intersection's oracle.
Run: python3 scripts/geo_clip_mirror.py  -> prints the pin values and their
rounding margins (pins must sit >=1e-4 from a rounding boundary)."""
import math

R = 6371008.8


def xyz(lng, lat):
    rl, rt = math.radians(lng), math.radians(lat)
    return (math.cos(rt) * math.cos(rl), math.cos(rt) * math.sin(rl), math.sin(rt))


def lnglat(v):
    lat = math.degrees(math.asin(max(-1.0, min(1.0, v[2]))))
    lng = math.degrees(math.atan2(v[1], v[0]))
    return (lng, lat)


def cross(a, b):
    return (a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2], a[0] * b[1] - a[1] * b[0])


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def norm(a):
    n = math.sqrt(dot(a, a))
    return (a[0] / n, a[1] / n, a[2] / n)


def tri_omega(a, b, c):
    return 2.0 * math.atan2(dot(a, cross(b, c)), 1.0 + dot(a, b) + dot(b, c) + dot(c, a))


def signed_omega(ring):
    c = norm((sum(v[0] for v in ring), sum(v[1] for v in ring), sum(v[2] for v in ring)))
    return sum(tri_omega(c, ring[i], ring[(i + 1) % len(ring)]) for i in range(len(ring)))


def point_in_ring(p, ring):
    ref = (0.0, 0.0, 1.0) if abs(p[2]) < 0.9 else (1.0, 0.0, 0.0)
    e = norm(cross(ref, p))
    nb = cross(p, e)

    def az(v):
        t = (v[0] - dot(v, p) * p[0], v[1] - dot(v, p) * p[1], v[2] - dot(v, p) * p[2])
        return math.atan2(dot(t, e), dot(t, nb))

    w = 0.0
    for i in range(len(ring)):
        d = az(ring[(i + 1) % len(ring)]) - az(ring[i])
        while d > math.pi:
            d -= 2 * math.pi
        while d < -math.pi:
            d += 2 * math.pi
        w += d
    return abs(w) > math.pi


def within_arc(a1, a2, n, q):
    return dot(cross(a1, q), n) > 1e-15 and dot(cross(q, a2), n) > 1e-15


def seg_cross(a1, a2, b1, b2):
    n1, n2 = cross(a1, a2), cross(b1, b2)
    t = cross(n1, n2)
    tn = math.sqrt(dot(t, t))
    if tn < 1e-18:
        return None
    q1 = (t[0] / tn, t[1] / tn, t[2] / tn)
    q2 = (-q1[0], -q1[1], -q1[2])
    if within_arc(a1, a2, n1, q1) and within_arc(b1, b2, n2, q1):
        return q1
    if within_arc(a1, a2, n1, q2) and within_arc(b1, b2, n2, q2):
        return q2
    return None


def arc_t(a1, q):
    return math.acos(max(-1.0, min(1.0, dot(a1, q))))


class Node:
    def __init__(self, p, is_inter):
        self.p, self.is_inter = p, is_inter
        self.next = self.twin = None
        self.entering = self.visited = False


def build_list(ring, inters):
    head = last = None

    def append(n):
        nonlocal head, last
        if head is None:
            head = n
        else:
            last.next = n
        last = n

    for i in range(len(ring)):
        append(Node(ring[i], False))
        for _, n in sorted(inters[i], key=lambda x: x[0]):
            append(n)
    last.next = head
    return head


def clip(a, b, intersection_op):
    """a, b: open CCW rings of unit vectors. Returns list of rings or None."""
    na, nb = len(a), len(b)
    inter_a = [[] for _ in range(na)]
    inter_b = [[] for _ in range(nb)]
    found = 0
    for i in range(na):
        a1, a2 = a[i], a[(i + 1) % na]
        for j in range(nb):
            b1, b2 = b[j], b[(j + 1) % nb]
            q = seg_cross(a1, a2, b1, b2)
            if q is not None:
                nB, nA = cross(b1, b2), cross(a1, a2)
                na_node, nb_node = Node(q, True), Node(q, True)
                na_node.twin, nb_node.twin = nb_node, na_node
                na_node.entering = dot(nB, a1) < 0
                nb_node.entering = dot(nA, b1) < 0
                inter_a[i].append((arc_t(a1, q), na_node))
                inter_b[j].append((arc_t(b1, q), nb_node))
                found += 1
    if found == 0:
        return None
    head_a = build_list(a, inter_a)
    build_list(b, inter_b)
    starts, cur = [], head_a
    while True:
        if cur.is_inter:
            starts.append(cur)
        cur = cur.next
        if cur is head_a:
            break
    out = []
    for s in starts:
        if s.visited or s.entering != intersection_op:
            continue
        ring, n, guard = [], s, 0
        cap = 4 * (na + nb + found)
        while True:
            n.visited = n.twin.visited = True
            ring.append(n.p)
            n = n.next
            while not n.is_inter and guard < cap:
                ring.append(n.p)
                n = n.next
                guard += 1
            n = n.twin
            guard += 1
            if n is s or n.twin is s or guard >= cap:
                break
        if len(ring) >= 3 and guard < cap:
            out.append(ring)
    return out


def ccw(pts):
    ring = [xyz(lng, lat) for lng, lat in pts]
    return list(reversed(ring)) if signed_omega(ring) < 0 else ring


def kql_polygon_area(coords):
    """EXACT mirror of the geo_polygon_area KQL expansion (fan from vertex 1,
    ring given as the open or closed [[lng,lat],...] list)."""
    v = [xyz(p[0], p[1]) for p in coords]
    if len(v) < 3:
        return 0.0
    acc = 0.0
    for i in range(1, len(v) - 1):  # sequence(2, size-1) is 1-based i, b=v[i], c=v[i+1]
        a, b, c = v[0], v[i], v[i + 1]
        acc += 2 * math.atan2(dot(a, cross(b, c)), 1 + dot(a, b) + dot(b, c) + dot(c, a))
    return abs(acc) * R * R


def gc_dist(lon1, lat1, lon2, lat2):
    return 2.0 * R * math.asin(math.sqrt(
        math.sin(math.radians(lat2 - lat1) / 2) ** 2 +
        math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) *
        math.sin(math.radians(lon2 - lon1) / 2) ** 2))


def line_length(coords):
    return sum(gc_dist(coords[i][0], coords[i][1], coords[i + 1][0], coords[i + 1][1])
               for i in range(len(coords) - 1))


def clip_line_with_ring(line_pts, ring):
    ln = [xyz(lng, lat) for lng, lat in line_pts]
    inside = point_in_ring(ln[0], ring)
    parts, cur = [], None
    if inside:
        cur = [lnglat(ln[0])]
        parts.append(cur)
    for i in range(len(ln) - 1):
        s, e = ln[i], ln[i + 1]
        xs = []
        for j in range(len(ring)):
            q = seg_cross(s, e, ring[j], ring[(j + 1) % len(ring)])
            if q is not None:
                xs.append((arc_t(s, q), q))
        for _, q in sorted(xs, key=lambda x: x[0]):
            if inside:
                cur.append(lnglat(q))
                cur = None
            else:
                cur = [lnglat(q)]
                parts.append(cur)
            inside = not inside
        if inside:
            cur.append(lnglat(e))
    return [p for p in parts if len(p) >= 2]


def margin(x, nd):
    f = x * 10 ** nd
    return abs(f - math.floor(f) - 0.5)


def pin(name, x, nd):
    print(f"{name} = {round(x, nd)}   (margin {margin(x, nd):.6f})")


if __name__ == "__main__":
    A = [[-3.0, -2.0], [4.0, -2.5], [3.5, 3.0], [-2.5, 3.5]]
    B = [[1.0, 0.0], [8.0, 0.5], [7.0, 6.0], [0.5, 5.0]]
    ra, rb = ccw(A), ccw(B)
    inter = clip(ra, rb, True)
    union = clip(ra, rb, False)
    print("intersection rings:", [len(r) for r in inter])
    print("union rings:", [len(r) for r in union])
    ring_i = [lnglat(v) for v in inter[0]]
    ring_u = [lnglat(v) for v in union[0]]
    print("inter ring:", [(round(x, 6), round(y, 6)) for x, y in ring_i])
    # areas via the geo_polygon_area expansion arithmetic on the CLOSED rings
    area_i = kql_polygon_area(ring_i + [ring_i[0]])
    area_u = kql_polygon_area(ring_u + [ring_u[0]])
    area_a = kql_polygon_area(A)
    area_b = kql_polygon_area(B)
    print(f"areaA {area_a:.3f} areaB {area_b:.3f} areaI {area_i:.3f} areaU {area_u:.3f}")
    print("incl-excl residual:", (area_i + area_u) - (area_a + area_b),
          " rel:", abs((area_i + area_u) - (area_a + area_b)) / (area_a + area_b))
    pin("ai_km2", area_i / 1e6, 3)
    pin("au_km2", area_u / 1e6, 3)
    pin("iv_n (open ring len)", len(ring_i), 0)
    # first vertex of the intersection ring (traversal starts at the first
    # A-entry crossing in A's edge order)
    pin("iv_x", ring_i[0][0], 6)
    pin("iv_y", ring_i[0][1], 6)
    # line/line crossing: diag pair from q_kql_geo_intersects
    L3 = [[-3.0, -3.0], [4.0, 5.0]]
    L4 = [[-3.0, 5.0], [4.0, -4.0]]
    q = seg_cross(xyz(*L3[0]), xyz(*L3[1]), xyz(*L4[0]), xyz(*L4[1]))
    lx, ly = lnglat(q)
    pin("ll_x", lx, 6)
    pin("ll_y", ly, 6)
    # line/polygon clip: straight crossing + zigzag double-crossing
    L5 = [[-5.0, 2.0], [5.0, 2.0]]
    parts5 = clip_line_with_ring(L5, ra)
    print("L5 parts:", [len(p) for p in parts5])
    pin("lp_len_km", sum(line_length(p) for p in parts5) / 1000.0, 3)
    M = [[-5.0, 0.0], [0.0, 0.0], [0.0, 10.0], [2.0, 10.0], [2.0, 0.0], [8.0, 0.0]]
    partsM = clip_line_with_ring(M, ra)
    print("M parts:", [len(p) for p in partsM])
    pin("mp_len_km", sum(line_length(p) for p in partsM) / 1000.0, 3)
    # containment + disjoint sanity for the in-plan gates
    C = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]
    rc = ccw(C)
    assert clip(ra, rc, True) is None and point_in_ring(rc[0], ra)
    area_c = kql_polygon_area(C)
    pin("ac_km2", area_c / 1e6, 3)
    D = [[20.0, 20.0], [24.0, 20.0], [24.0, 24.0], [20.0, 24.0]]
    rd = ccw(D)
    assert clip(ra, rd, True) is None
    assert not point_in_ring(rd[0], ra) and not point_in_ring(ra[0], rd)
    print("containment/disjoint sanity OK")

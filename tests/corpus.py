"""Named loop corpus ported from the reference test suite
(s2/loop_test.go:27-165) via the text DSL "lat:lng, lat:lng, ..."
(s2/textformat_test.go:22-137)."""

from geo_ray.state.loop import Loop

LOOP_TEXTS = {
    # The northern hemisphere, defined using two pairs of antipodal points.
    "northHemi": "0:-180, 0:-90, 0:0, 0:90",
    # The northern hemisphere, defined using three points 120 degrees apart.
    "northHemi3": "0:-180, 0:-60, 0:60",
    "southHemi": "0:90, 0:0, 0:-90, 0:-180",
    "westHemi": "0:-180, -90:0, 0:0, 90:0",
    "eastHemi": "90:0, 0:0, -90:0, 0:-180",
    # The "near" hemisphere, centered on 0:0.
    "nearHemi": "0:-90, -90:0, 0:90, 90:0",
    # The "far" hemisphere, centered on 0:180.
    "farHemi": "90:0, 0:90, -90:0, 0:-90",
    # A spiral stripe that slightly over-wraps the equator.
    "candyCane": "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70",
    # A small clockwise loop in the northern & eastern hemispheres.
    "smallNECW": "35:20, 45:20, 40:25",
    # Loop around the north pole at 80 degrees.
    "arctic80": "80:-150, 80:-30, 80:90",
    # Loop around the south pole at 80 degrees.
    "antarctic80": "-80:120, -80:0, -80:-120",
    # A completely degenerate triangle along the equator that RobustCCW()
    # considers to be CCW.
    "lineTriangle": "0:1, 0:2, 0:3",
    # A nearly-degenerate CCW chevron near the equator with very long sides
    # (about 80 degrees).  Tests robustness.
    "skinnyChevron": "0:0, -1e-320:80, 0:1e-320, 1e-320:80",
    # A diamond-shaped loop around the point 0:180.
    "loopA": "0:178, -1:180, 0:-179, 1:-180",
    # Another diamond-shaped loop around the point 0:180.
    "loopB": "0:179, -1:180, 0:-178, 1:-180",
    # The intersection of A and B.
    "aIntersectB": "0:179, -1:180, 0:-179, 1:-180",
    # The union of A and B.
    "aUnionB": "0:178, -1:180, 0:-178, 1:-180",
    # A minus B (concave).
    "aMinusB": "0:178, -1:180, 0:179, 1:-180",
    # B minus A (concave).
    "bMinusA": "0:-179, -1:180, 0:-178, 1:-180",
    # A shape gotten from A by adding a triangle to one edge, and
    # subtracting a triangle from the opposite edge.
    "loopC": "0:178, 0:180, -1:180, 0:-179, 1:-179, 1:-180",
    # A shape gotten from A by adding a triangle to one edge, and adding
    # another triangle to the opposite edge.
    "loopD": "0:178, -1:178, -1:180, 0:-179, 1:-179, 1:-180",
    #   3------------2
    #   |            |               ^
    #   |  7-8  b-c  |               |
    #   |  | |  | |  |      Latitude |
    #   0--6-9--a-d--1               |
    #   |  | |       |               |
    #   |  f-e       |               +----------->
    #   |            |                 Longitude
    #   4------------5
    "loopE": "0:30, 0:34, 0:36, 0:39, 0:41, 0:44, 30:44, 30:30",
    "loopF": "0:30, -30:30, -30:44, 0:44, 0:41, 0:39, 0:36, 0:34",
    "loopG": "0:30, 0:34, 10:34, 10:36, 0:36, 0:39, 10:39, 10:41, 0:41, 0:44, 30:44, 30:30",
    "loopH": "0:30, 0:34, -10:34, -10:36, 0:36, 0:39, 10:39, 10:41, 0:41, 0:44, 30:44, 30:30",
    "loopI": "10:34, 0:34, -10:34, -10:36, 0:36, 10:36",
}


def make_loop(name: str) -> Loop:
    if name == "empty":
        return Loop.empty()
    if name == "full":
        return Loop.full()
    return Loop.from_text(LOOP_TEXTS[name])

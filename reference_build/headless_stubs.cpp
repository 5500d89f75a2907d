// Link-time no-op overrides for OpenCV highgui display calls, so the
// unmodified reference binary runs headless and its *compute* speed can be
// timed.  The reference ships with FLAG_DISPLAY_DEPTH_MAP=true
// (ExternVariable.h:68), which calls imshow + waitKey(1000) once per frame
// (DepthPropagation.cpp:1221-1225) — a GUI debug view, not part of the
// algorithm.  Stubbing removes the X dependency and the 1 s/frame UI sleep;
// all numeric work (including the JET colormap render feeding imshow) still
// executes.
#include <opencv2/core.hpp>

namespace cv {
void imshow(const String&, InputArray) {}
int waitKey(int) { return -1; }
void namedWindow(const String&, int) {}
}  // namespace cv

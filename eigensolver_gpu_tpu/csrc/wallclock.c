/* Native monotonic wall-clock timer.
 *
 * TPU-native counterpart of the reference's test_driver/wallclock.c:30-42,
 * which exposes a gettimeofday()-based seconds timer to Fortran. We keep a
 * native C component for the same role (benchmark timing independent of
 * Python-level overhead) but use clock_gettime(CLOCK_MONOTONIC) -- immune
 * to wall-clock adjustments -- and expose it to Python via ctypes.
 *
 * Build: cc -O2 -shared -fPIC -o libwallclock.so wallclock.c
 */
#include <time.h>

double wallclock(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

// Replacement TU for the reference's db.cpp, which fails to lex under g++
// (Unicode minus/quote characters inside an #if 0 block).  Everything the
// compiled chain calls from DB is inline in db.h; only these static
// definitions (db.cpp:7-11) and the debug helpers live out-of-line.
// Original harness code; constants are the reference's documented
// full-scale/floor values (db.cpp:7-11).
#include "db.h"

const double DB::fullScale = 1.0;
const double DB::minDb = -120.0;
const double DB::minPower = 1e-12;
const double DB::maxDb = 0.0;
const double DB::maxPower = 1.0;

void DB::analyzeCPX(CPX *, quint32, const char *, bool, double, double) {}

void DB::test() {}

// Minimal Qt-surface stubs so the reference's DSP core (pebblelib +
// application/agc + application/demod) compiles headless on Linux without Qt.
//
// This file is ORIGINAL harness code (part of pebblesdr_tpu's parity
// tooling); it implements just enough of the Qt API surface that the
// reference sources at /root/reference touch: integer typedefs, QString,
// QDebug sinks, QMutex, QVector, QFile/QDir no-ops, QObject/Q_OBJECT.
// The reference itself is compiled read-only from its own tree.
#ifndef PEBBLE_QT_STUB_H
#define PEBBLE_QT_STUB_H

#include <algorithm>  // iqbalance.cpp uses std::nth_element bare
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <mutex>

typedef int8_t qint8;
typedef uint8_t quint8;
typedef int16_t qint16;
typedef uint16_t quint16;
typedef int32_t qint32;
typedef uint32_t quint32;
typedef int64_t qint64;
typedef uint64_t quint64;

#ifndef Q_UNUSED
#define Q_UNUSED(x) (void)(x);
#endif
#ifndef Q_ASSERT
#define Q_ASSERT(x) (void)(x);
#endif

template <typename T>
inline T qBound(T lo, T v, T hi) { return v < lo ? lo : (v > hi ? hi : v); }
template <typename T> inline T qMin(T a, T b) { return a < b ? a : b; }
template <typename T> inline T qMax(T a, T b) { return a > b ? a : b; }
template <typename T> inline T qAbs(T a) { return a < 0 ? -a : a; }
#ifndef Q_OBJECT
#define Q_OBJECT
#endif
#ifndef Q_DECL_EXPORT
#define Q_DECL_EXPORT
#define Q_DECL_IMPORT
#endif

class QString {
public:
    QString() {}
    QString(const char *s) : m_s(s ? s : "") {}
    QString(const std::string &s) : m_s(s) {}
    bool operator==(const QString &o) const { return m_s == o.m_s; }
    const char *toLatin1() const { return m_s.c_str(); }
    std::string m_s;
};

class QStringList : public std::vector<QString> {};

// Swallow-everything debug stream (qDebug() << ...).
class QDebug {
public:
    template <typename T> QDebug &operator<<(const T &) { return *this; }
};
inline QDebug qDebug() { return QDebug(); }
inline QDebug qWarning() { return QDebug(); }
inline QDebug qCritical() { return QDebug(); }

class QMutex {
public:
    void lock() { m_m.lock(); }
    void unlock() { m_m.unlock(); }
private:
    std::mutex m_m;
};

class QObject {
public:
    virtual ~QObject() {}
};

template <typename T>
class QVector : public std::vector<T> {
public:
    bool isEmpty() const { return this->empty(); }
    int length() const { return (int)this->size(); }
    void append(const T &v) { this->push_back(v); }
};

template <typename T>
class QList : public QVector<T> {};

class QIODevice {
public:
    enum OpenModeFlag { NotOpen = 0, ReadOnly = 1, WriteOnly = 2, ReadWrite = 3 };
};

class QFile : public QIODevice {
public:
    QFile() {}
    QFile(const QString &) {}
    void setFileName(const QString &) {}
    bool open(int) { return false; }
    qint64 write(const char *) { return 0; }
    qint64 write(const char *, qint64) { return 0; }
    void close() {}
};

class QDir {
public:
    static void setCurrent(const QString &) {}
};

#endif // PEBBLE_QT_STUB_H

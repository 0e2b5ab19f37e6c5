/*
 * Minimal jni.h stand-in for SYNTAX-CHECKING java/jni/uhdr_jni.cpp on hosts
 * without a JDK (tests/test_java_binding.py).  Covers exactly the subset of
 * the JNI C++ API the shim uses; never used for a real build — java/build.py
 * always prefers $JAVA_HOME/include/jni.h.
 */
#ifndef UHDR_TPU_STUB_JNI_H
#define UHDR_TPU_STUB_JNI_H

#include <cstdint>

#define JNIEXPORT __attribute__((visibility("default")))
#define JNICALL
#define JNI_ABORT 2

typedef int32_t jint;
typedef int64_t jlong;
typedef int8_t jbyte;
typedef int16_t jshort;
typedef float jfloat;
typedef double jdouble;
typedef uint8_t jboolean;
typedef uint16_t jchar;
typedef jint jsize;

class _jobject {};
typedef _jobject* jobject;
typedef jobject jclass;
typedef jobject jstring;
typedef jobject jarray;
typedef jarray jbyteArray;
typedef jarray jshortArray;
typedef jarray jintArray;
typedef jarray jlongArray;
typedef jarray jfloatArray;
typedef jobject jthrowable;

struct _jfieldID {};
typedef _jfieldID* jfieldID;

struct JNIEnv {
  jclass FindClass(const char*);
  jint ThrowNew(jclass, const char*);
  jboolean ExceptionCheck();
  void ExceptionClear();
  jclass GetObjectClass(jobject);
  jfieldID GetFieldID(jclass, const char*, const char*);
  jlong GetLongField(jobject, jfieldID);
  void SetLongField(jobject, jfieldID, jlong);
  jint GetIntField(jobject, jfieldID);
  void SetIntField(jobject, jfieldID, jint);
  jsize GetArrayLength(jarray);
  jbyte* GetByteArrayElements(jbyteArray, jboolean*);
  void ReleaseByteArrayElements(jbyteArray, jbyte*, jint);
  jshort* GetShortArrayElements(jshortArray, jboolean*);
  void ReleaseShortArrayElements(jshortArray, jshort*, jint);
  jint* GetIntArrayElements(jintArray, jboolean*);
  void ReleaseIntArrayElements(jintArray, jint*, jint);
  jlong* GetLongArrayElements(jlongArray, jboolean*);
  void ReleaseLongArrayElements(jlongArray, jlong*, jint);
  void GetFloatArrayRegion(jfloatArray, jsize, jsize, jfloat*);
  void SetFloatArrayRegion(jfloatArray, jsize, jsize, const jfloat*);
  jbyteArray NewByteArray(jsize);
  void SetByteArrayRegion(jbyteArray, jsize, jsize, const jbyte*);
  jfloatArray NewFloatArray(jsize);
  jstring NewStringUTF(const char*);
};

#endif /* UHDR_TPU_STUB_JNI_H */
